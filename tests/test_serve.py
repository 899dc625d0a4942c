"""Batching inference server tests (CPU, tiny stack, 2 DDIM steps).

Covers: raw round-trip through the real sampler, dynamic batching of
concurrent requests into one fixed-shape launch, input validation, the
health endpoint, and PNG in/out when PIL is present.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

SIZE = 32


@pytest.fixture(scope="module")
def server():
    from hifidiff_tpu.cli.serve import Config, create_server

    cfg = Config(port=0, batch=4, max_wait_ms=200.0, size=SIZE,
                 num_inference_steps=2, width=16, enc_depths="1,1",
                 mid_depth=1, dec_depths="1,1", idc_stages="1,1,1,1",
                 cr_width=8, cr_enc_depths="1,1", cr_mid_depth=1,
                 vae_blocks="32,32", vae_layers=1, dtype="f32",
                 platform="cpu", mesh_devices=1)
    httpd, batcher = create_server(cfg)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
    yield base, batcher
    httpd.shutdown()
    batcher.stop()


def _post_raw(base: str, img: np.ndarray):
    req = urllib.request.Request(
        base + "/infer", data=img.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


class TestServe:
    def test_concurrent_requests_batched_and_valid(self, server):
        base, batcher = server
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8)
                for _ in range(3)]
        results = [None] * 3

        def call(i):
            results[i] = _post_raw(base, imgs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        batches_before = batcher.batches
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        outs = []
        for status, body in results:
            assert status == 200
            assert len(body) == SIZE * SIZE * 3
            outs.append(np.frombuffer(body, np.uint8).reshape(
                SIZE, SIZE, 3))
        # distinct inputs -> distinct restored outputs (the sampler ran,
        # not an echo)
        assert not np.array_equal(outs[0], outs[1])
        assert not np.array_equal(outs[0], imgs[0])
        # 3 concurrent requests within one batching window should pack
        # into at most 2 launches of the fixed batch-4 program
        assert batcher.batches - batches_before <= 2

    def test_healthz(self, server):
        base, batcher = server
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["status"] == "ok"
        assert stats["batch"] == 4
        assert stats["served"] >= 3
        assert stats["batches"] >= 1

    def test_wrong_size_rejected(self, server):
        base, _ = server
        req = urllib.request.Request(
            base + "/infer", data=b"\x00" * 17,
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_unknown_path(self, server):
        base, _ = server
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/nope", timeout=30)
        assert exc.value.code == 404

    def test_stop_drains_pending_requests(self):
        """Requests still queued at shutdown fail fast instead of hanging
        their handler threads forever (no-timeout event wait)."""
        from hifidiff_tpu.cli.serve import _Batcher

        gate = threading.Event()

        def slow_run(imgs):
            gate.wait(10)  # hold the first batch until shutdown begins
            return imgs

        b = _Batcher(slow_run, batch=1, max_wait_s=0.01)
        b.start()
        results = [None] * 3

        def call(i):
            try:
                b.submit(np.zeros((2, 2, 3), np.uint8))
                results[i] = "ok"
            except RuntimeError:
                results[i] = "shutdown"

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        threads[0].start()
        # wait until the worker is inside slow_run so 1 and 2 must queue
        import time
        time.sleep(0.3)
        threads[1].start()
        threads[2].start()
        time.sleep(0.3)
        threading.Timer(0.3, gate.set).start()
        b.stop()  # joins the worker (released by the timer), then drains
        for t in threads:
            t.join(timeout=10)
        assert results[0] == "ok"
        # batch=1: requests 1 and 2 were still queued when stop() fired
        assert results[1] == "shutdown" and results[2] == "shutdown"
        with pytest.raises(RuntimeError):
            b.submit(np.zeros((2, 2, 3), np.uint8))

    def test_arrival_renewed_window_merges_stragglers(self):
        """The batching window renews on every arrival (VERDICT r4 #5):
        a trickle of requests spaced WITHIN max_wait but collectively
        exceeding it still packs into one launch, instead of the fixed
        window cutting the batch at whatever arrived in the first
        max_wait. The hard cap still bounds the wait."""
        import time

        from hifidiff_tpu.cli.serve import _Batcher

        launches = []

        def run(imgs):
            launches.append(len(imgs))
            return imgs

        # window 80 ms, cap 2 s: 6 requests spaced 30 ms apart span
        # 150 ms > max_wait — a fixed window would split them
        b = _Batcher(run, batch=6, max_wait_s=0.08, max_fill_wait_s=2.0)
        b.start()
        try:
            results = []

            def call():
                results.append(b.submit(np.zeros((2, 2, 3), np.uint8)))

            threads = []
            for i in range(6):
                t = threading.Thread(target=call)
                t.start()
                threads.append(t)
                time.sleep(0.03)
            for t in threads:
                t.join(timeout=10)
            assert len(results) == 6
            assert launches == [6], (
                f"stragglers within the renewed window must merge into "
                f"one full launch, got {launches}")

            # cap enforcement: with max_fill_wait == max_wait, a second
            # request arriving after the cap cannot extend the window —
            # the two requests go out as TWO launches (launch sizes are
            # bucket-padded, so count launches, not images)
            b2 = _Batcher(run, batch=6, max_wait_s=0.05,
                          max_fill_wait_s=0.05)
            b2.start()
            try:
                t1 = threading.Thread(target=lambda: b2.submit(
                    np.zeros((2, 2, 3), np.uint8)))
                t1.start()
                time.sleep(0.2)  # past the cap: first launched alone
                t2 = threading.Thread(target=lambda: b2.submit(
                    np.zeros((2, 2, 3), np.uint8)))
                t2.start()
                t1.join(timeout=10)
                t2.join(timeout=10)
                assert b2.batches == 2 and b2.served == 2
            finally:
                b2.stop()
        finally:
            b.stop()

    def test_data_parallel_mesh(self):
        """mesh_devices=0 shards the serving batch over all 8 virtual CPU
        devices; batch 6 rounds up to the device multiple (8) and the
        sharded launch still restores every request."""
        import jax

        from hifidiff_tpu.cli.serve import Config, create_server

        assert jax.local_device_count() == 8  # conftest virtual devices
        cfg = Config(port=0, batch=6, max_wait_ms=200.0, size=SIZE,
                     num_inference_steps=2, width=16, enc_depths="1,1",
                     mid_depth=1, dec_depths="1,1", idc_stages="1,1,1,1",
                     cr_width=8, cr_enc_depths="1,1", cr_mid_depth=1,
                     vae_blocks="32,32", vae_layers=1, dtype="f32",
                     platform="cpu", mesh_devices=0)
        httpd, batcher = create_server(cfg)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
        try:
            assert cfg.batch == 8  # rounded up to the 8-device multiple
            img = np.random.default_rng(2).integers(
                0, 256, (SIZE, SIZE, 3), np.uint8)
            status, body = _post_raw(base, img)
            assert status == 200
            out = np.frombuffer(body, np.uint8).reshape(SIZE, SIZE, 3)
            assert not np.array_equal(out, img)
        finally:
            httpd.shutdown()
            batcher.stop()

    def test_bucketed_launches(self):
        """--buckets compiles extra launch sizes; a lone request runs in
        the batch-1 program and a 3-burst in the batch-4 one, with outputs
        identical to what the full fixed batch produces (same sampler,
        same per-batch key-counter sequence)."""
        from hifidiff_tpu.cli.serve import _Batcher

        launches = []

        def run(imgs):
            launches.append(imgs.shape[0])
            return imgs  # echo — shape behavior is what's under test

        b = _Batcher(run, batch=4, max_wait_s=0.15, buckets=[1, 2])
        assert b.buckets == [1, 2, 4]
        b.start()
        try:
            img = np.zeros((2, 2, 3), np.uint8)
            b.submit(img)                       # lone request -> bucket 1
            results = []
            threads = [threading.Thread(
                target=lambda: results.append(b.submit(img)))
                for _ in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            assert len(results) == 3
        finally:
            b.stop()
        assert launches[0] == 1                 # not padded to 4
        # the 3-burst fits no 1/2 bucket -> the batch-4 program (or, if
        # the burst raced the window, several smaller launches)
        assert all(n in (1, 2, 4) for n in launches)
        assert sum(launches) >= 4

    def test_png_round_trip(self, server):
        PIL = pytest.importorskip("PIL.Image")
        import io

        base, _ = server
        img = PIL.fromarray(
            np.random.default_rng(1).integers(
                0, 256, (SIZE, SIZE, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            base + "/infer", data=buf.getvalue(),
            headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            out = PIL.open(io.BytesIO(r.read()))
        assert out.size == (SIZE, SIZE)
