"""Serving runtime tests (scflow_tpu/runtime/server.py): micro-batcher
semantics with a fake backend, request validation, and the full
HTTP -> batcher -> jitted serving fn -> npz response path on CPU.

The reference has no serving runtime (test.py batch eval only); these
tests pin the beyond-parity deployment surface.
"""

import threading
import time

import numpy as np
import pytest

from scflow_tpu.runtime.server import (
    MicroBatcher,
    PoseService,
    RefineRequest,
    ServingStats,
    make_http_server,
    refine_remote,
    validate_request,
)


def make_request(p=2, hw=(32, 40), num_class=2, seed=0):
    rng = np.random.default_rng(seed)
    return RefineRequest(
        frame=rng.integers(0, 255, (*hw, 3)).astype(np.uint8),
        rotations=np.tile(np.eye(3, dtype=np.float32)[None], (p, 1, 1)),
        translations=np.tile(np.array([[0, 0, 500.0]], np.float32), (p, 1)),
        k=np.array([[50.0, 0, hw[1] / 2], [0, 50.0, hw[0] / 2], [0, 0, 1]],
                   np.float32),
        labels=rng.integers(0, num_class, p).astype(np.int32),
    )


class TestValidation:
    def test_accepts_well_formed(self):
        validate_request(make_request(), (32, 40), 2)

    def test_rejects_0_255_float_frames(self):
        req = make_request()
        req.frame = req.frame.astype(np.float32)  # 0..255 floats
        with pytest.raises(ValueError, match="float frames"):
            validate_request(req, (32, 40), 2)

    def test_rejects_over_budget(self):
        with pytest.raises(ValueError, match="batch budget"):
            validate_request(make_request(p=9), (32, 40), 2, max_objects=8)

    @pytest.mark.parametrize(
        "mutate,msg",
        [
            (lambda r: setattr(r, "frame", r.frame[:16]), "frame must be"),
            (lambda r: setattr(r, "rotations", r.rotations[:1]),
             "translations must be"),  # P now 1, translations still 2 rows
            (lambda r: setattr(r, "k", np.zeros((2, 2), np.float32)), "k must"),
            (lambda r: setattr(r, "labels", r.labels + 99), "labels out of range"),
            (lambda r: setattr(r, "rotations", r.rotations[:0]), "no objects"),
        ],
    )
    def test_rejects_malformed(self, mutate, msg):
        req = make_request()
        mutate(req)
        with pytest.raises(ValueError, match=msg):
            validate_request(req, (32, 40), 2)


class FakeBackend:
    """Counts batches; echoes per-object translations + 1."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def __call__(self, requests):
        self.batches.append([r.num_objects for r in requests])
        if self.delay:
            time.sleep(self.delay)
        out = []
        for r in requests:
            out.append({
                "rotations": r.rotations,
                "translations": r.translations + 1.0,
            })
        return out


class TestMicroBatcher:
    def test_single_request_roundtrip(self):
        backend = FakeBackend()
        b = MicroBatcher(backend, max_delay_ms=1.0)
        try:
            res = b.submit(make_request(p=3)).result(timeout=10)
            assert res["translations"].shape == (3, 3)
            assert np.all(res["translations"][:, 2] == 501.0)
            assert backend.batches == [[3]]
        finally:
            b.stop()

    def test_concurrent_requests_coalesce(self):
        backend = FakeBackend(delay=0.05)
        stats = ServingStats()
        b = MicroBatcher(backend, max_delay_ms=200.0, stats=stats)
        try:
            futs = [b.submit(make_request(p=2, seed=i)) for i in range(4)]
            for f in futs:
                f.result(timeout=30)
            # the 200ms window must have coalesced (the first batch may
            # have raced ahead with fewer, but not 4 singletons)
            assert len(backend.batches) < 4
            assert stats.snapshot()["requests"] == 4
        finally:
            b.stop()

    def test_queued_requests_coalesce_past_deadline(self):
        """Requests that accumulated while the batcher was busy must be
        drained into ONE batch even though the first one's delay window
        has long expired — the regression behind the measured
        mean_requests_per_batch=1.0 under concurrent load: the collect
        loop treated an expired deadline as 'close the batch now' and the
        device stepped once per request."""
        import threading

        gate = threading.Event()
        batches = []

        def slow_backend(requests):
            batches.append([r.num_objects for r in requests])
            if len(batches) == 1:
                gate.wait(timeout=10)  # hold batch 1 until the queue fills
            return [
                {"rotations": np.tile(np.eye(3, dtype=np.float32)[None],
                                      (r.num_objects, 1, 1)),
                 "translations": np.zeros((r.num_objects, 3), np.float32)}
                for r in requests
            ]

        b = MicroBatcher(slow_backend, max_delay_ms=1.0)
        try:
            first = b.submit(make_request(p=1, seed=0))
            import time as _t

            _t.sleep(0.2)  # batch 1 is now in slow_backend, well past 1 ms
            futs = [b.submit(make_request(p=1, seed=i)) for i in range(1, 6)]
            _t.sleep(0.05)  # let the 5 requests sit in the queue
            gate.set()
            first.result(timeout=10)
            for f in futs:
                f.result(timeout=10)
            # all 5 queued requests must have been drained into one batch
            assert batches == [[1], [1] * 5], batches
        finally:
            gate.set()
            b.stop()

    def test_device_keepalive_ticks_and_stops(self):
        """The keep-alive ticker calls its tick at the interval, swallows
        tick errors, and joins cleanly on stop (the live ~10s
        idle-reconnect stall it targets is measured in docs/SERVING.md)."""
        import time as _t

        from scflow_tpu.runtime.server import DeviceKeepAlive

        calls = []

        def tick():
            calls.append(1)
            if len(calls) == 2:
                raise RuntimeError("transient")  # must not kill the thread

        ka = DeviceKeepAlive(tick, interval_s=0.02)
        _t.sleep(0.2)
        assert ka._thread.is_alive()
        ka.stop()
        assert not ka._thread.is_alive()
        assert len(calls) >= 3  # kept ticking past the raising tick

    def test_object_budget_holds_overflow_request(self):
        backend = FakeBackend(delay=0.05)
        b = MicroBatcher(backend, max_objects=4, max_delay_ms=500.0)
        try:
            futs = [b.submit(make_request(p=3, seed=i)) for i in range(2)]
            for f in futs:
                f.result(timeout=30)
            # 3+3 > 4: the second request must land in its own batch
            assert backend.batches == [[3], [3]]
        finally:
            b.stop()

    def test_backend_error_propagates_to_all_waiters(self):
        def boom(requests):
            raise RuntimeError("device on fire")

        b = MicroBatcher(boom, max_delay_ms=50.0)
        try:
            futs = [b.submit(make_request(seed=i)) for i in range(2)]
            for f in futs:
                with pytest.raises(RuntimeError, match="device on fire"):
                    f.result(timeout=10)
            assert b.stats.snapshot()["errors"] >= 1
        finally:
            b.stop()

    def test_two_stage_pipelines_dispatch_and_fetch(self):
        """With fetch_batch set, dispatch of batch N+1 must begin while
        batch N is still being fetched (device/host overlap)."""
        fetch_started = threading.Event()
        second_dispatched = threading.Event()
        overlap = []

        def dispatch(requests):
            if fetch_started.is_set():
                second_dispatched.set()
            return [{"rotations": r.rotations,
                     "translations": r.translations} for r in requests]

        def fetch(handle):
            fetch_started.set()
            # hold the fetch open; the batcher thread should dispatch the
            # next batch in the meantime
            overlap.append(second_dispatched.wait(timeout=10))
            return handle

        b = MicroBatcher(dispatch, fetch_batch=fetch, max_delay_ms=1.0)
        try:
            f1 = b.submit(make_request(seed=0))
            # wait until batch 1 is in fetch, then submit batch 2
            assert fetch_started.wait(timeout=10)
            f2 = b.submit(make_request(seed=1))
            assert f1.result(timeout=30) is not None
            assert f2.result(timeout=30) is not None
            assert overlap and overlap[0], (
                "second dispatch did not overlap the first fetch")
        finally:
            b.stop()

    def test_two_stage_fetch_error_propagates(self):
        def dispatch(requests):
            return requests

        def fetch(handle):
            raise RuntimeError("transfer failed")

        b = MicroBatcher(dispatch, fetch_batch=fetch, max_delay_ms=1.0)
        try:
            with pytest.raises(RuntimeError, match="transfer failed"):
                b.submit(make_request()).result(timeout=10)
        finally:
            b.stop()

    def test_stop_fails_stranded_requests(self):
        backend = FakeBackend()
        b = MicroBatcher(backend, max_delay_ms=1.0)
        b.stop()
        fut = b.submit(make_request())  # enqueued after the sentinel
        b.stop()  # drains the queue and fails the future
        with pytest.raises(RuntimeError, match="shutting down"):
            fut.result(timeout=5)

    def test_stats_quantiles(self):
        s = ServingStats()
        for ms in [1, 2, 3, 4, 100]:
            s.record_latency(ms / 1e3)
        snap = s.snapshot()
        assert snap["latency_ms"]["p50"] == 3.0
        assert snap["latency_ms"]["p99"] == 100.0


@pytest.fixture(scope="module")
def tiny_service():
    """Real PoseService over a tiny SCFlowRefiner on CPU."""
    import jax.numpy as jnp

    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import RenderAssets
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.serving import make_serving_fn

    img, nclass, hw = 64, 2, (96, 128)
    bank = make_synthetic_bank(nclass, kind="sphere", subdivisions=2, size=70.0)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(
        iters=2, detach_depth_for_xy=True,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                           in_channels=224),
    )
    import jax

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, img, img, 3))
    R = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    t = jnp.tile(jnp.asarray([[0.0, 0.0, 500.0]]), (2, 1))
    K = jnp.tile(jnp.asarray([[[80.0, 0, img / 2], [0, 80.0, img / 2],
                               [0, 0, 1]]]), (2, 1, 1))
    labels = jnp.zeros((2,), jnp.int32)
    variables = model.init(key, dummy, dummy, R, t,
                           jnp.zeros((2, img, img)), K, labels)
    serve_fn = make_serving_fn(model, ra, ra.verts, ra.vert_valid,
                               image_size=img)
    service = PoseService(serve_fn, variables, frame_hw=hw, num_class=nclass,
                          max_frames=4, max_objects=8, fixed_bucket=True)
    service.warmup()
    return service


class TestPoseService:
    def test_run_slices_per_request(self, tiny_service):
        reqs = [make_request(p=2, hw=tiny_service.frame_hw, seed=0),
                make_request(p=3, hw=tiny_service.frame_hw, seed=1)]
        out = tiny_service.run(reqs)
        assert [o["rotations"].shape for o in out] == [(2, 3, 3), (3, 3, 3)]
        assert [o["translations"].shape for o in out] == [(2, 3), (3, 3)]
        for o in out:
            # rotations stay orthonormal through the refinement
            rtr = np.einsum("pij,pik->pjk", o["rotations"], o["rotations"])
            np.testing.assert_allclose(rtr, np.tile(np.eye(3), (len(rtr), 1, 1)),
                                       atol=1e-4)

    def test_padding_invariance(self, tiny_service):
        """A request refined alone must match the same request sharing a
        batch with others (padding/coalescing can't leak across objects)."""
        req = make_request(p=2, hw=tiny_service.frame_hw, seed=0)
        alone = tiny_service.run([req])[0]
        other = make_request(p=3, hw=tiny_service.frame_hw, seed=1)
        shared = tiny_service.run([req, other])[0]
        np.testing.assert_allclose(alone["rotations"], shared["rotations"],
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(alone["translations"], shared["translations"],
                                   rtol=0, atol=2e-3)


class TestRaftService:
    def test_raft_serving_with_host_pnp(self, tiny_service):
        """RAFT-family serving: device flow + host PnP in fetch's post_fn
        (what serve_main wires for non-SCFlow configs)."""
        import jax
        import jax.numpy as jnp

        from scflow_tpu.refiners import RAFTRefinerFlowMask
        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow
        from scflow_tpu.serving import make_raft_serving_fn

        img = 64
        # reuse the SCFlow fixture's mesh bank via its serve_fn closure is
        # not possible — rebuild the small assets
        from scflow_tpu.refiners.system import RenderAssets
        from scflow_tpu.render.meshbank import make_synthetic_bank

        bank = make_synthetic_bank(2, kind="sphere", subdivisions=2, size=70.0)
        ra = RenderAssets.from_bank(bank)
        model = RAFTRefinerFlowMask(iters=2)
        key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((2, img, img, 3))
        variables = model.init(key, dummy, dummy)
        serve_fn = make_raft_serving_fn(model, ra, ra.verts, ra.vert_valid,
                                        image_size=img)

        def post_fn(out):
            R, t, _ = solve_poses_from_flow(
                out["flow"], out["rendered_depths"], out["ref_rotations"],
                out["ref_translations"], out["new_k"],
                occlusion=out.get("occlusion"),
            )
            return {"rotations": R, "translations": t}

        svc = PoseService(
            serve_fn, variables, frame_hw=tiny_service.frame_hw, num_class=2,
            max_frames=4, max_objects=8,
            fetch_keys=("flow", "occlusion", "rendered_depths", "new_k",
                        "ref_rotations", "ref_translations"),
            post_fn=post_fn,
        )
        out = svc.run([make_request(p=2, hw=tiny_service.frame_hw)])
        assert out[0]["rotations"].shape == (2, 3, 3)
        assert out[0]["translations"].shape == (2, 3)
        rtr = np.einsum("pij,pik->pjk", out[0]["rotations"],
                        out[0]["rotations"])
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-4)


class TestMeshService:
    def test_sharded_matches_single_device(self, tiny_service):
        """Data-parallel serving over the 8-device CPU mesh must agree with
        the unsharded service (replicated params + object-axis sharding)."""
        from scflow_tpu.parallel import make_mesh

        mesh = make_mesh()
        assert len(mesh.devices.ravel()) == 8
        sharded = PoseService(
            tiny_service.serve_fn, tiny_service.variables,
            frame_hw=tiny_service.frame_hw, num_class=tiny_service.num_class,
            max_frames=4, max_objects=8, fixed_bucket=True, mesh=mesh,
        )
        reqs = [make_request(p=2, hw=tiny_service.frame_hw, seed=0),
                make_request(p=3, hw=tiny_service.frame_hw, seed=1)]
        ref = tiny_service.run(reqs)
        got = sharded.run(reqs)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g["rotations"], r["rotations"],
                                       atol=2e-5)
            np.testing.assert_allclose(g["translations"], r["translations"],
                                       atol=2e-3)

    def test_bucket_rounds_to_device_multiple(self, tiny_service):
        from scflow_tpu.parallel import make_mesh

        svc = PoseService(
            tiny_service.serve_fn, tiny_service.variables,
            frame_hw=tiny_service.frame_hw, num_class=tiny_service.num_class,
            max_frames=4, max_objects=8, fixed_bucket=False,
            mesh=make_mesh(3),  # deliberately non-pow2 device count
        )
        # a 2-object request must pad to a multiple of 3 internally and
        # still slice back to exactly 2 results
        out = svc.run([make_request(p=2, hw=tiny_service.frame_hw)])
        assert out[0]["rotations"].shape == (2, 3, 3)


class TestHTTPServer:
    def test_end_to_end_http(self, tiny_service):
        # two-stage (dispatch/fetch pipelined) — what serve_main wires up
        batcher = MicroBatcher(tiny_service.dispatch,
                               fetch_batch=tiny_service.fetch,
                               max_frames=4, max_objects=8,
                               max_delay_ms=20.0)
        httpd = make_http_server(tiny_service, batcher, "127.0.0.1", 0)
        port = httpd.server_address[1]
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{port}"
        try:
            # healthz
            from urllib.request import urlopen

            assert urlopen(url + "/healthz", timeout=10).read() == b"ok"

            # two concurrent clients -> both answered, results match direct
            req = make_request(p=2, hw=tiny_service.frame_hw, seed=0)
            direct = tiny_service.run([req])[0]
            results = {}

            def client(i):
                results[i] = refine_remote(
                    url, req.frame, req.rotations, req.translations,
                    req.k, req.labels, timeout=120)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert set(results) == {0, 1}
            for r in results.values():
                np.testing.assert_allclose(r["rotations"], direct["rotations"],
                                           atol=2e-5)

            # stats populated
            import json as _json

            snap = _json.loads(
                urlopen(url + "/v1/stats", timeout=10).read())
            assert snap["requests"] == 2 and snap["errors"] == 0

            # malformed payload -> 400, not a hang
            from urllib.error import HTTPError
            from urllib.request import Request

            bad = Request(url + "/v1/refine", data=b"not-an-npz")
            with pytest.raises(HTTPError) as ei:
                urlopen(bad, timeout=10)
            assert ei.value.code == 400

            # empty body -> 400 (np.load raises EOFError), not a reset
            empty = Request(url + "/v1/refine", data=b"")
            with pytest.raises(HTTPError) as ei:
                urlopen(empty, timeout=10)
            assert ei.value.code == 400

            # a 404'd POST with a body must not desync keep-alive: the
            # next request on the same connection still works
            import http.client

            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
            conn.request("POST", "/nope", body=b"x" * 4096)
            assert conn.getresponse().read() == b"not found"
            conn.request("GET", "/healthz")
            assert conn.getresponse().read() == b"ok"
            conn.close()
        finally:
            httpd.shutdown()
            batcher.stop()
