"""Online serving runtime: request queue -> micro-batcher -> jitted device
serving fn -> HTTP front end.

The reference has no serving story beyond batch evaluation (its test.py
prints per-image latency, `/root/reference/test.py:116-120`); this module is
the deployment surface the rebuild adds on top of the device-side serving
pipeline (`scflow_tpu/serving.py`): clients POST one camera frame plus
initial poses, the server coalesces concurrent requests into one padded
device batch (default `max_objects=64` — the latency-friendly point;
batch 128 measures ~1% more throughput at 2x step latency, see
docs/PERFORMANCE.md "Serving re-bench"), and answers with refined poses
in the original camera frame.

Design notes, TPU-first:

- ONE jit specialization by default (`fixed_bucket=True` pads every batch
  to `max_objects`): on the remote-compile TPU backend a new shape costs
  minutes, padded compute costs ~1.5 ms/object.  `fixed_bucket=False`
  switches to shared pow2 buckets (the eval-loop trade) for backends where
  compiles are cheap.
- The frame bank is always padded to `max_frames`: `serving.crop_resize`
  gathers rows per *object*, so unused frames cost HBM only, not FLOPs —
  padding them is free compared to a per-frame-count specialization.
- Everything is stdlib (http.server, threading, queue); payloads are npz
  (`numpy.savez`), so any numpy client can talk to it without extra deps.
"""

import io
import json
import queue
import threading
import time
import zipfile
from collections import deque
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from scflow_tpu.runtime.eval_loop import _bucket

_STOP = object()


# ---------------------------------------------------------------- requests


@dataclass
class RefineRequest:
    """One client request: a frame and the objects to refine in it."""

    frame: np.ndarray  # (Hf, Wf, 3) uint8 or float32 in [0, 1]
    rotations: np.ndarray  # (P, 3, 3) float32 initial rotations
    translations: np.ndarray  # (P, 3) float32 initial translations (mm)
    k: np.ndarray  # (3, 3) or (P, 3, 3) float32 intrinsics
    labels: np.ndarray  # (P,) int32 class ids
    future: object = None  # concurrent.futures.Future, set by the batcher
    t_enqueue: float = 0.0

    @property
    def num_objects(self) -> int:
        return int(self.rotations.shape[0])


def validate_request(req: RefineRequest, frame_hw, num_class: int,
                     max_objects: Optional[int] = None):
    h, w = frame_hw
    if req.frame.ndim != 3 or req.frame.shape[2] != 3:
        raise ValueError(f"frame must be (H, W, 3), got {req.frame.shape}")
    if req.frame.shape[:2] != (h, w):
        raise ValueError(
            f"frame must be {h}x{w} (server frame_hw), got "
            f"{req.frame.shape[0]}x{req.frame.shape[1]}"
        )
    if req.frame.dtype != np.uint8 and req.frame.size:
        m = float(req.frame.max())
        if not np.isfinite(m):
            raise ValueError("frame contains non-finite values")
        if m > 1.5:
            raise ValueError(
                f"float frames must be in [0, 1] (got max {m:.1f}); "
                "send uint8 for 0-255 data")
    for name in ("rotations", "translations", "k"):
        if not np.isfinite(getattr(req, name)).all():
            raise ValueError(f"{name} contain non-finite values")
    p = req.num_objects
    if p == 0:
        raise ValueError("request has no objects")
    if max_objects is not None and p > max_objects:
        raise ValueError(
            f"request has {p} objects, server batch budget is {max_objects} "
            "(split the request)")
    if req.rotations.shape != (p, 3, 3):
        raise ValueError(f"rotations must be (P, 3, 3), got {req.rotations.shape}")
    if req.translations.shape != (p, 3):
        raise ValueError(
            f"translations must be (P, 3), got {req.translations.shape}")
    if req.k.shape not in ((3, 3), (p, 3, 3)):
        raise ValueError(f"k must be (3, 3) or (P, 3, 3), got {req.k.shape}")
    if req.labels.shape != (p,):
        raise ValueError(f"labels must be (P,), got {req.labels.shape}")
    lmin, lmax = int(req.labels.min()), int(req.labels.max())
    if lmin < 0 or lmax >= num_class:
        raise ValueError(
            f"labels out of range [0, {num_class}): min {lmin} max {lmax}")


# ------------------------------------------------------------------- stats


def nearest_rank(sorted_vals, p: float):
    """Nearest-rank percentile over an ascending sequence (None if empty).
    Shared by the server stats and the load-test client so both sides of a
    report use the same convention."""
    if not sorted_vals:
        return None
    return sorted_vals[min(len(sorted_vals) - 1, int(p * len(sorted_vals)))]


class ServingStats:
    """Thread-safe counters + latency quantiles over a sliding window."""

    def __init__(self, window: int = 2048):
        self._lock = threading.Lock()
        self._lat = deque(maxlen=window)
        self.requests = 0
        self.objects = 0
        self.batches = 0
        self.errors = 0
        self.started = time.time()

    def record_batch(self, n_requests: int, n_objects: int):
        with self._lock:
            self.batches += 1
            self.requests += n_requests
            self.objects += n_objects

    def record_latency(self, seconds: float):
        with self._lock:
            self._lat.append(seconds)

    def record_error(self):
        with self._lock:
            self.errors += 1

    def snapshot(self) -> Dict:
        with self._lock:
            lat = sorted(self._lat)
            requests, objects, batches = self.requests, self.objects, self.batches
            errors = self.errors
            uptime = time.time() - self.started

        def q(p):
            v = nearest_rank(lat, p)
            return None if v is None else round(v * 1e3, 3)

        return {
            "uptime_s": round(uptime, 1),
            "requests": requests,
            "objects": objects,
            "batches": batches,
            "errors": errors,
            "mean_objects_per_batch": round(objects / batches, 2) if batches else None,
            "mean_requests_per_batch": round(requests / batches, 2) if batches else None,
            "latency_ms": {"p50": q(0.50), "p95": q(0.95), "p99": q(0.99)},
        }


# ----------------------------------------------------------------- service


class PoseService:
    """Pads coalesced requests into one fixed-shape device batch and runs
    the jitted serving fn (`scflow_tpu.serving.make_serving_fn`).

    With `mesh` set, serving is data-parallel over the mesh: the padded
    object batch is sharded along its leading axis, params and frames are
    replicated, and XLA splits the work across chips (the TPU-native
    replacement for the reference's DDP eval, SURVEY.md §2.2).  Batch
    buckets are rounded up to a multiple of the device count.
    """

    def __init__(
        self,
        serve_fn: Callable,
        variables,
        frame_hw=(480, 640),
        num_class: int = 21,
        max_frames: int = 8,
        max_objects: int = 64,
        fixed_bucket: bool = True,
        mesh=None,
        fetch_keys: Sequence[str] = ("rotations", "translations"),
        post_fn: Optional[Callable] = None,
    ):
        """`fetch_keys` limits the device->host transfer to what the
        response (or `post_fn`) actually consumes.  `post_fn(out)` runs on
        the fetched numpy dict and must return a dict with 'rotations' and
        'translations' — the host PnP stage for RAFT-family serving."""
        self.serve_fn = serve_fn
        self.fetch_keys = tuple(fetch_keys)
        self.post_fn = post_fn
        self.frame_hw = tuple(frame_hw)
        self.num_class = num_class
        self.max_frames = max_frames
        self.max_objects = max_objects
        self.fixed_bucket = fixed_bucket
        self.mesh = mesh
        if mesh is not None:
            from scflow_tpu.parallel import batch_sharding, replicate

            self._obj_sharding = batch_sharding(mesh)
            self.variables = replicate(variables, mesh)
            self.n_devices = len(mesh.devices.ravel())
        else:
            self._obj_sharding = None
            self.variables = variables
            self.n_devices = 1

    def _frame_to_float(self, frame: np.ndarray) -> np.ndarray:
        if frame.dtype == np.uint8:
            return frame.astype(np.float32) / 255.0
        return np.asarray(frame, np.float32)

    def dispatch(self, requests: Sequence[RefineRequest]):
        """Pad + enqueue one device batch; returns a handle for `fetch`.

        jax dispatch is asynchronous: this returns as soon as the work is
        enqueued, so a batcher can overlap the NEXT batch's host-side prep
        (unpickling, padding) with the device computing THIS one.
        """
        import jax
        import jax.numpy as jnp

        h, w = self.frame_hw
        frames = np.zeros((self.max_frames, h, w, 3), np.float32)
        rot, trans, ks, labels, fidx, counts = [], [], [], [], [], []
        for i, req in enumerate(requests):
            frames[i] = self._frame_to_float(req.frame)
            p = req.num_objects
            rot.append(np.asarray(req.rotations, np.float32))
            trans.append(np.asarray(req.translations, np.float32))
            k = np.asarray(req.k, np.float32)
            ks.append(np.tile(k[None], (p, 1, 1)) if k.ndim == 2 else k)
            labels.append(np.asarray(req.labels, np.int32))
            fidx.append(np.full((p,), i, np.int32))
            counts.append(p)

        n = int(sum(counts))
        b = _bucket(n, self.max_objects, fixed=self.fixed_bucket)
        # sharded serving splits the object axis evenly across chips
        b = -(-b // self.n_devices) * self.n_devices
        pad = b - n

        def cat(parts, pad_row):
            out = np.concatenate(parts, axis=0)
            if pad:
                out = np.concatenate(
                    [out, np.tile(pad_row, (pad,) + (1,) * (out.ndim - 1))], axis=0
                )
            return out

        rotations = cat(rot, np.eye(3, dtype=np.float32)[None])
        translations = cat(trans, np.array([[0.0, 0.0, 1000.0]], np.float32))
        K = cat(ks, np.array(
            [[[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]]], np.float32))
        labs = cat(labels, np.zeros((1,), np.int32))
        frame_idx = cat(fidx, np.zeros((1,), np.int32))

        if self._obj_sharding is not None:
            from scflow_tpu.parallel import replicated_sharding

            put = lambda x: jax.device_put(x, self._obj_sharding)
            put_frames = lambda x: jax.device_put(
                x, replicated_sharding(self.mesh))
        else:
            put = put_frames = jnp.asarray
        out = self.serve_fn(
            self.variables, put_frames(frames), put(frame_idx),
            put(rotations), put(translations), put(K), put(labs),
        )
        return out, counts

    def fetch(self, handle) -> List[Dict[str, np.ndarray]]:
        """Block on the device result of a `dispatch` handle and slice it
        back per request.  Only the keys the response carries are pulled,
        and only the REAL object rows: padding (up to max_objects per
        batch) would otherwise inflate the device->host transfer and run
        post_fn's host PnP on dozens of phantom objects."""
        import jax

        out, counts = handle
        n = int(sum(counts))
        out = {k: np.asarray(jax.device_get(out[k][:n]))
               for k in self.fetch_keys if k in out}
        if self.post_fn is not None:
            out = self.post_fn(out)
        results, start = [], 0
        for p in counts:
            results.append({
                "rotations": out["rotations"][start:start + p],
                "translations": out["translations"][start:start + p],
            })
            start += p
        return results

    def run(self, requests: Sequence[RefineRequest]) -> List[Dict[str, np.ndarray]]:
        return self.fetch(self.dispatch(requests))

    def warmup(self, buckets: Optional[Sequence[int]] = None):
        """Compile the serving fn for every bucket it can see (ONE bucket
        under fixed_bucket, the default)."""
        if buckets is None:
            if self.fixed_bucket:
                buckets = [self.max_objects]
            else:
                buckets, b = [], 1
                while b <= self.max_objects:
                    buckets.append(b)
                    b *= 2
        h, w = self.frame_hw
        for b in buckets:
            req = RefineRequest(
                frame=np.zeros((h, w, 3), np.uint8),
                rotations=np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1)),
                translations=np.tile(
                    np.array([[0.0, 0.0, 1000.0]], np.float32), (b, 1)),
                k=np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]],
                           np.float32),
                labels=np.zeros((b,), np.int32),
            )
            self.run([req])


class DeviceKeepAlive:
    """Background ticker that keeps the serving device path warm while
    the server is idle.

    On remote-attached backends the path can go cold after a few idle
    minutes and the NEXT dispatch pays a reconnect: measured on the
    remote-TPU tunnel, the first request after ~3 min idle took 10.7 s
    while the following ones took 98-140 ms.  `tick` should exercise the
    REAL serving executable (PoseService.run on a 1-object synthetic
    request, `make_service_keepalive_tick`).  Honest measurement note
    (docs/SERVING.md "idle cold-start"): on THIS tunnel neither a generic
    tiny-jit ping nor the real-executable tick eliminated the stall —
    the cold state evidently lives in the tunnel daemon outside the
    server process — so the feature ships OFF by default; it targets
    conventional remote deployments where executable/connection warmth
    is the usual cause.  Tick failures are swallowed: a dead backend
    must surface through real requests, not kill the server.
    """

    def __init__(self, tick: Callable[[], object], interval_s: float = 30.0):
        self.interval = interval_s
        self._tick = tick
        self._stop_evt = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, name="scflow-keepalive", daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop_evt.wait(self.interval):
            try:
                self._tick()
            except Exception:
                pass

    def stop(self):
        self._stop_evt.set()
        self._thread.join(timeout=5)


def make_service_keepalive_tick(service: "PoseService") -> Callable[[], object]:
    """A keep-alive tick that runs the service's real serving fn on one
    synthetic object (same fixed bucket -> same executable as traffic).
    Bypasses the batcher so /v1/stats reflect only real requests."""
    h, w = service.frame_hw
    req = RefineRequest(
        frame=np.zeros((h, w, 3), np.uint8),
        rotations=np.eye(3, dtype=np.float32)[None],
        translations=np.array([[0.0, 0.0, 1000.0]], np.float32),
        k=np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]],
                   np.float32),
        labels=np.zeros((1,), np.int32),
    )
    return lambda: service.run([req])


# ----------------------------------------------------------------- batcher


class MicroBatcher:
    """Coalesces concurrent requests into device batches.

    The first request in an empty queue opens a window of `max_delay_ms`;
    requests arriving inside it join the batch until `max_frames` requests
    or `max_objects` total objects are reached.  A request that would
    overflow the object budget is held for the next batch (never dropped,
    never split).
    """

    def __init__(
        self,
        run_batch: Callable[[Sequence[RefineRequest]], List[Dict]],
        max_frames: int = 8,
        max_objects: int = 64,
        max_delay_ms: float = 5.0,
        stats: Optional[ServingStats] = None,
        fetch_batch: Optional[Callable] = None,
    ):
        """With only `run_batch`, batches execute one at a time.  With
        `fetch_batch`, `run_batch` is treated as an async DISPATCH
        (PoseService.dispatch) whose handle is resolved by `fetch_batch`
        (PoseService.fetch) on a second thread — the device computes batch
        N while this thread pads/enqueues batch N+1 (jax async dispatch)."""
        self._run_batch = run_batch
        self._fetch_batch = fetch_batch
        self.max_frames = max_frames
        self.max_objects = max_objects
        self.max_delay = max_delay_ms / 1e3
        self.stats = stats or ServingStats()
        self._q = queue.Queue()
        self._held = None
        self._threads = []
        if fetch_batch is not None:
            # maxsize 2: one batch on device + one handle waiting is enough
            # pipelining; more would just grow queue latency
            self._inflight = queue.Queue(maxsize=2)
            self._threads.append(threading.Thread(
                target=self._fetch_loop, name="scflow-fetcher", daemon=True))
        self._threads.append(threading.Thread(
            target=self._loop, name="scflow-batcher", daemon=True))
        for t in self._threads:
            t.start()

    def submit(self, req: RefineRequest) -> "Future":
        from concurrent.futures import Future

        req.future = Future()
        req.t_enqueue = time.perf_counter()
        self._q.put(req)
        return req.future

    def stop(self):
        self._q.put(_STOP)
        for t in self._threads:
            t.join(timeout=30)
        # fail anything still queued (submitted after stop, or stuck behind
        # the sentinel) so waiters error fast instead of sleeping out their
        # full result() timeout
        leftovers = []
        if self._held is not None and self._held is not _STOP:
            leftovers.append(self._held)
            self._held = None
        while True:
            try:
                leftovers.append(self._q.get_nowait())
            except queue.Empty:
                break
        for req in leftovers:
            if req is not _STOP and getattr(req, "future", None) is not None:
                req.future.set_exception(RuntimeError("server shutting down"))

    def _collect(self) -> Optional[List[RefineRequest]]:
        first = self._held or self._q.get()
        self._held = None
        if first is _STOP:
            return None
        batch = [first]
        objs = first.num_objects
        deadline = first.t_enqueue + self.max_delay
        while len(batch) < self.max_frames:
            timeout = deadline - time.perf_counter()
            try:
                if timeout <= 0:
                    # The delay window bounds how long we WAIT for future
                    # requests — it must not discard requests already
                    # queued.  Under load the batcher re-enters _collect
                    # after a dispatch, i.e. past the first request's
                    # deadline; before this drain-step existed that closed
                    # every batch at ONE request (measured: 8 concurrent
                    # clients -> mean_requests_per_batch 1.0, the device
                    # stepping once per request).
                    nxt = self._q.get_nowait()
                else:
                    nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is _STOP:
                self._held = _STOP
                break
            if objs + nxt.num_objects > self.max_objects:
                self._held = nxt
                break
            batch.append(nxt)
            objs += nxt.num_objects
        return batch

    def _resolve(self, batch, results):
        now = time.perf_counter()
        self.stats.record_batch(len(batch), sum(r.num_objects for r in batch))
        for req, res in zip(batch, results):
            self.stats.record_latency(now - req.t_enqueue)
            req.future.set_result(res)

    def _fail(self, batch, e):
        self.stats.record_error()
        for req in batch:
            req.future.set_exception(e)

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                if self._fetch_batch is not None:
                    self._inflight.put(_STOP)
                return
            try:
                out = self._run_batch(batch)
            except Exception as e:  # surface device errors to every waiter
                self._fail(batch, e)
                continue
            if self._fetch_batch is None:
                self._resolve(batch, out)
            else:
                self._inflight.put((batch, out))

    def _fetch_loop(self):
        while True:
            item = self._inflight.get()
            if item is _STOP:
                return
            batch, handle = item
            try:
                results = self._fetch_batch(handle)
            except Exception as e:
                self._fail(batch, e)
                continue
            self._resolve(batch, results)


# ----------------------------------------------------------- HTTP frontend


def _npz_bytes(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _parse_npz(body: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def make_http_server(service: PoseService, batcher: MicroBatcher,
                     host: str = "127.0.0.1", port: int = 8080,
                     request_timeout: float = 60.0):
    """HTTP front end.  POST /v1/refine (npz: frame, ref_rotations,
    ref_translations, k, labels) -> npz {rotations, translations};
    GET /healthz -> ok; GET /v1/stats -> JSON counters."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet; stats carry the signal
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/v1/stats":
                body = json.dumps(batcher.stats.snapshot()).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def _drain_body(self):
            """Consume the request body so HTTP/1.1 keep-alive stays in
            sync (an unread payload would be parsed as the next request
            line on this connection)."""
            length = int(self.headers.get("Content-Length", 0) or 0)
            while length > 0:
                chunk = self.rfile.read(min(length, 1 << 20))
                if not chunk:
                    break
                length -= len(chunk)

        def do_POST(self):
            if self.path != "/v1/refine":
                self._drain_body()
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = _parse_npz(self.rfile.read(length))
                req = RefineRequest(
                    frame=data["frame"],
                    rotations=data["ref_rotations"],
                    translations=data["ref_translations"],
                    k=data["k"],
                    labels=data["labels"],
                )
                validate_request(req, service.frame_hw, service.num_class,
                                 max_objects=batcher.max_objects)
            except (KeyError, ValueError, OSError, EOFError,
                    zipfile.BadZipFile) as e:
                # np.load raises EOFError on an empty body and BadZipFile
                # on a corrupt zip — both are client errors, not crashes
                batcher.stats.record_error()
                self._send(400, str(e).encode(), "text/plain")
                return
            try:
                result = batcher.submit(req).result(timeout=request_timeout)
            except Exception as e:
                self._send(500, str(e).encode(), "text/plain")
                return
            self._send(200, _npz_bytes(result), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def refine_remote(url: str, frame, rotations, translations, k, labels,
                  timeout: float = 60.0) -> Dict[str, np.ndarray]:
    """Minimal numpy client for the HTTP server (stdlib urllib)."""
    from urllib.request import Request, urlopen

    body = _npz_bytes({
        "frame": np.asarray(frame),
        "ref_rotations": np.asarray(rotations, np.float32),
        "ref_translations": np.asarray(translations, np.float32),
        "k": np.asarray(k, np.float32),
        "labels": np.asarray(labels, np.int32),
    })
    req = Request(url.rstrip("/") + "/v1/refine", data=body,
                  headers={"Content-Type": "application/octet-stream"})
    with urlopen(req, timeout=timeout) as resp:
        return _parse_npz(resp.read())
