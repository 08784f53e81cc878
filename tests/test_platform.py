"""Platform-selection helpers (scflow_tpu/utils/platform.py).

The remote-TPU relay pre-flight matters because the axon PJRT client has
no timeout in backend init: with the relay down, every entry point that
touches jax hangs forever instead of erroring.
"""

import socket

import pytest

from scflow_tpu.utils.platform import check_remote_backend_reachable


class TestRemoteBackendPreflight:
    def test_noop_when_env_selects_cpu(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        check_remote_backend_reachable(timeout=0.1)  # must not raise

    def test_noop_without_axon_env(self, monkeypatch):
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        check_remote_backend_reachable(timeout=0.1)  # must not raise

    def test_raises_when_relay_down(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")

        def refuse(*a, **k):
            raise ConnectionRefusedError(111, "Connection refused")

        monkeypatch.setattr(socket, "create_connection", refuse)
        with pytest.raises(SystemExit, match="unreachable"):
            check_remote_backend_reachable(timeout=0.1)

    def test_passes_when_relay_up(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        # a real listening socket on an ephemeral port stands in for the relay
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        orig = socket.create_connection
        monkeypatch.setattr(
            socket, "create_connection",
            lambda addr, timeout=None: orig(("127.0.0.1", port), timeout=timeout),
        )
        try:
            check_remote_backend_reachable(timeout=1.0)  # must not raise
        finally:
            srv.close()
