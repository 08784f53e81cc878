"""Platform selection helper.

This image's sitecustomize registers a remote-TPU PJRT plugin and forces
jax_platforms='axon,cpu', which silently overrides the JAX_PLATFORMS env
var.  Tools call this once at startup so the user's env choice (e.g.
JAX_PLATFORMS=cpu for CI) is honored again."""

import os


def resolve_backend(name: str) -> str:
    """Kernel-backend auto-selection, shared by the renderer and the corr
    lookup: 'auto' -> 'pallas' on TPU, 'xla' elsewhere (the Pallas kernels
    run on CPU only in interpret mode, which is test-only)."""
    if name == "auto":
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return name


def enable_compilation_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache (halves cold-start wall
    time on the remote-compile TPU backend: bench.py 12.9 -> 5.7 min).
    Respects an existing JAX_COMPILATION_CACHE_DIR env setting."""
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without the knobs


def check_remote_backend_reachable(timeout: float = 5.0):
    """Fail fast when the remote-TPU relay is unreachable.

    The axon PJRT client blocks forever inside backend init when its
    loopback relay (127.0.0.1:8083) is down — there is no timeout on that
    path — so a benchmark or CLI run would hang indefinitely instead of
    erroring.  Call this BEFORE the first jax use in any entry point that
    intends to run on the TPU.  No-op when the env selects another
    platform (JAX_PLATFORMS=cpu) or the axon env vars are absent.
    """
    want = os.environ.get("JAX_PLATFORMS", "")
    first = want.split(",")[0].strip().lower()
    if first and first != "axon":
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=timeout):
            pass
    except OSError as e:
        raise SystemExit(
            "remote-TPU relay 127.0.0.1:8083 is unreachable "
            f"({e}); the axon backend would block forever in init. "
            "Restore the tunnel or run with JAX_PLATFORMS=cpu."
        )


def apply_env_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
