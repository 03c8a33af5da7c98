"""Serving layer: dynamic batching into one compiled shape + socket API.

The server must (a) never change the compiled signature (pad instead),
(b) return each request its own image, (c) batch concurrent requests,
(d) keep serving after a failed batch, and (e) round-trip the JSON
socket protocol.
"""

import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot
from uce_tpu.diffusion.pipeline import SDPipeline
from uce_tpu.serving.server import GenerationServer, ServerConfig


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    import jax.numpy as jnp

    snap = make_sd_snapshot(tmp_path_factory.mktemp("snap"))
    return SDPipeline.from_pretrained(snap, dtype=jnp.float32)


CFG = dict(num_inference_steps=2, height=32, width=32)


def test_serial_requests_and_padding(pipe):
    with GenerationServer(pipe, ServerConfig(batch_size=3, max_wait_ms=1,
                                             **CFG)) as srv:
        img = srv.generate("a cat", seed=7)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        # single request into a batch of 3 -> 2 padded slots
        assert srv.stats.batches == 1
        assert srv.stats.padded_slots == 2
        assert srv.stats.occupancy == pytest.approx(1 / 3)


def test_batch_ladder_picks_smallest_fitting_rung(pipe):
    """With a compiled batch ladder, a lone request runs the batch-1
    signature (zero padded slots) and a 3-request burst runs the batch-4
    rung (one pad) — never the top rung for everything."""
    cfg = ServerConfig(batch_size=4, batch_sizes=(1, 2, 4),
                       max_wait_ms=500, **CFG)
    with GenerationServer(pipe, cfg) as srv:
        assert srv.batch_sizes == (1, 2, 4)
        img = srv.generate("a cat", seed=7)
        assert img.shape == (32, 32, 3)
        assert srv.stats.batches == 1 and srv.stats.padded_slots == 0
        futures = [srv.submit(p, seed=s)
                   for p, s in [("a cat", 1), ("a dog", 2), ("a bird", 3)]]
        imgs = [f.result(timeout=120) for f in futures]
    assert srv.stats.batches == 2
    assert srv.stats.padded_slots == 1  # 3 requests -> rung 4
    assert not np.array_equal(imgs[0], imgs[1])


def test_batch_ladder_image_matches_single_signature(pipe):
    """Which rung a request lands on must not change its image beyond
    compiled-program rounding: rungs are separate XLA programs whose
    tilings may differ by a few ULPs (which can cross a uint8 rounding
    boundary on TPU — the ladder's documented determinism caveat), but
    the (prompt, seed) -> image mapping must be the same computation."""
    cfg = dict(max_wait_ms=1, **CFG)
    with GenerationServer(pipe, ServerConfig(batch_size=3, **cfg)) as srv:
        via_pad = srv.generate("a cat", seed=7)
    with GenerationServer(
            pipe, ServerConfig(batch_size=3, batch_sizes=(1, 3),
                               **cfg)) as srv:
        via_rung1 = srv.generate("a cat", seed=7)
    diff = np.abs(via_pad.astype(np.int16) - via_rung1.astype(np.int16))
    assert diff.max() <= 1, f"rung changed the image (max diff {diff.max()})"


def test_results_match_direct_pipeline_call(pipe):
    """Padding must not change a request's image: server output equals a
    direct pipeline call at the same (prompt, seed) signature."""
    direct = pipe(["a cat", "", ""], seed=[7, 0, 0],
                  num_images_per_prompt=1, guidance_scale=7.5, **CFG)[0]
    with GenerationServer(pipe, ServerConfig(batch_size=3, max_wait_ms=1,
                                             **CFG)) as srv:
        served = srv.generate("a cat", seed=7)
    np.testing.assert_array_equal(served, direct)


def test_concurrent_requests_batch_together(pipe):
    cfg = ServerConfig(batch_size=4, max_wait_ms=500, **CFG)
    with GenerationServer(pipe, cfg) as srv:
        futures = [srv.submit(p, seed=s)
                   for p, s in [("a cat", 1), ("a dog", 2), ("a bird", 3)]]
        imgs = [f.result(timeout=120) for f in futures]
    assert srv.stats.requests == 3
    assert srv.stats.batches == 1, "concurrent requests must share a batch"
    # different prompts/seeds -> different images
    assert not np.array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[1], imgs[2])


def test_distinct_seeds_distinct_images(pipe):
    with GenerationServer(pipe, ServerConfig(batch_size=2, max_wait_ms=1,
                                             **CFG)) as srv:
        a = srv.generate("a cat", seed=1)
        b = srv.generate("a cat", seed=2)
        c = srv.generate("a cat", seed=1)
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, c)  # same signature -> deterministic


def test_failed_batch_keeps_serving(pipe):
    calls = {"n": 0}
    real = pipe.__call__

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device error")
        return real(*a, **kw)

    srv = GenerationServer(flaky, ServerConfig(batch_size=2, max_wait_ms=1,
                                               warmup=False, **CFG))
    srv.start()
    try:
        with pytest.raises(RuntimeError, match="injected"):
            srv.generate("a cat", seed=1)
        img = srv.generate("a cat", seed=1)  # server must still be alive
        assert img.shape == (32, 32, 3)
    finally:
        srv.close()


def test_socket_roundtrip(pipe, tmp_path):
    from uce_tpu.serving import socket_api

    sock = str(tmp_path / "uce.sock")
    srv = GenerationServer(pipe, ServerConfig(batch_size=2, max_wait_ms=1,
                                              **CFG)).start()
    frontend = socket_api.SocketFrontend(srv, sock).start_background()
    try:
        out = str(tmp_path / "cat.png")
        reply = socket_api.request(sock, {"prompt": "a cat", "seed": 7,
                                          "save_path": out})
        assert reply["status"] == "ok" and reply["path"] == out
        from uce_tpu.utils.imaging import load_image

        assert load_image(out).shape == (32, 32, 3)

        reply = socket_api.request(sock, {"prompt": "a cat", "seed": 7})
        assert reply["status"] == "ok"
        import base64

        assert base64.b64decode(reply["png_base64"])[:4] == b"\x89PNG"

        stats = socket_api.request(sock, {"cmd": "stats"})
        assert stats["status"] == "ok" and stats["requests"] == 2

        bad = socket_api.request(sock, {"seed": 1})
        assert bad["status"] == "error" and "prompt" in bad["error"]
    finally:
        frontend.close()
        srv.close()


def test_flux_family_served(pipe):
    """The batching core adapts to a pipeline family whose call signature
    lacks scheduler/negative_prompt kwargs (FLUX)."""
    from tests.test_flux_pipeline import tiny_flux_pipe

    fpipe = tiny_flux_pipe.__wrapped__()  # undecorated fixture fn
    cfg = ServerConfig(batch_size=2, max_wait_ms=1, num_inference_steps=2,
                       guidance_scale=0.0, height=32, width=32)
    with GenerationServer(fpipe, cfg) as srv:
        img = srv.generate("a cat", seed=5)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # a negative prompt must be rejected, not silently dropped
    with GenerationServer(fpipe, cfg) as srv:
        with pytest.raises(ValueError, match="negative"):
            srv.submit("a cat", seed=1, negative_prompt="blurry").result()


def test_submit_after_close_raises(pipe):
    srv = GenerationServer(pipe, ServerConfig(batch_size=2, warmup=False,
                                              **CFG)).start()
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit("a cat")


def test_cancelled_future_does_not_poison_batch(pipe):
    """A client cancelling its Future must not fail its batchmates."""
    cfg = ServerConfig(batch_size=4, max_wait_ms=500, **CFG)
    with GenerationServer(pipe, cfg) as srv:
        doomed = srv.submit("a cat", seed=1)
        keeper = srv.submit("a dog", seed=2)
        assert doomed.cancel()
        img = keeper.result(timeout=120)
    assert img.shape == (32, 32, 3)


def test_close_fails_orphaned_requests(pipe):
    """A request left in the queue at close() must get an exception, not a
    Future that never resolves."""
    srv = GenerationServer(pipe, ServerConfig(batch_size=2, warmup=False,
                                              **CFG))
    # not started: nothing consumes the queue, emulating the submit/close
    # race where a request lands behind the shutdown sentinel
    fut = srv.submit("a cat", seed=1)
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=10)


def test_unsupported_scheduler_fails_at_startup():
    """Static config the pipeline family can't honor must fail start(),
    not every future batch (esp. with warmup disabled)."""
    from tests.test_flux_pipeline import tiny_flux_pipe

    fpipe = tiny_flux_pipe.__wrapped__()
    cfg = ServerConfig(batch_size=2, scheduler="ddim", warmup=False,
                       num_inference_steps=2, guidance_scale=0.0,
                       height=32, width=32)
    with pytest.raises(ValueError, match="scheduler"):
        GenerationServer(fpipe, cfg).start()


def test_socket_path_not_stolen(pipe, tmp_path):
    """A second frontend on a live socket must refuse to start instead of
    silently unlinking the live server's endpoint."""
    from uce_tpu.serving import socket_api

    sock = str(tmp_path / "uce.sock")
    srv = GenerationServer(pipe, ServerConfig(batch_size=2, warmup=False,
                                              **CFG)).start()
    frontend = socket_api.SocketFrontend(srv, sock).start_background()
    try:
        with pytest.raises(RuntimeError, match="already listening"):
            socket_api.SocketFrontend(srv, sock)
    finally:
        frontend.close()
        srv.close()


def test_frontend_close_before_serve_does_not_hang(pipe, tmp_path):
    """close() without serve_forever()/start_background() must return
    (BaseServer.shutdown would wait forever on the never-set
    is_shut_down event) and release the socket path."""
    import os
    import time

    from uce_tpu.serving import socket_api

    sock = str(tmp_path / "uce.sock")
    srv = GenerationServer(pipe, ServerConfig(batch_size=2, warmup=False,
                                              **CFG))
    frontend = socket_api.SocketFrontend(srv, sock)
    t0 = time.monotonic()
    frontend.close()  # loop never entered
    assert time.monotonic() - t0 < 5.0
    assert not os.path.exists(sock)


def test_serve_cli_bench_mode_with_ladder(tmp_path, capsys):
    """'uce serve --bench' end-to-end: builds the pipeline from a
    snapshot, parses the --batch_sizes ladder, runs the Poisson load, and
    prints one JSON report line per offered rate."""
    import json

    from uce_tpu.cli.main import main as cli_main

    snap = make_sd_snapshot(tmp_path / "snap")
    rc = cli_main([
        "serve", "--model_id", snap, "--bench", "5",
        "--bench_requests", "3", "--batch_size", "2",
        "--batch_sizes", "1,2", "--image_size", "32",
        "--num_inference_steps", "2", "--max_wait_ms", "30",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    rep = lines[0]
    assert rep["n_requests"] == 3 and rep["offered_rps"] == 5.0
    assert rep["batches"] >= 2  # rung 2 can't swallow 3 requests at once


def test_loadgen_report(pipe):
    """The synthetic-load harness produces a coherent report: every
    request completes, throughput/occupancy/latency are consistent with
    the server's own stats, and the run is repeatable (seeded arrivals)."""
    from uce_tpu.serving.loadgen import run_load

    cfg = ServerConfig(batch_size=2, max_wait_ms=30, **CFG)
    with GenerationServer(pipe, cfg) as srv:
        rep = run_load(srv, rate_rps=50.0, n_requests=6, seed=0)
    assert rep.n_requests == 6
    assert rep.batches >= 3  # 6 requests into batch_size=2
    assert rep.throughput_rps > 0
    assert 0 < rep.latency_p50_s <= rep.latency_p95_s
    assert 0.5 <= rep.occupancy <= 1.0
    assert rep.batch_seconds_mean > 0
    js = rep.json()
    assert js["offered_rps"] == 50.0 and isinstance(js["batches"], int)


def test_pin_rung_restores_bit_determinism(pipe):
    """With pin_rung, every batch runs the TOP rung, so one (prompt, seed)
    yields bit-identical images regardless of batch occupancy — the
    ladder's determinism caveat (docs/PERF.md) goes away."""
    cfg = ServerConfig(batch_size=4, batch_sizes=(1, 2, 4), pin_rung=True,
                       max_wait_ms=300, **CFG)
    with GenerationServer(pipe, cfg) as srv:
        solo = srv.generate("a cat", seed=7)
        assert srv.stats.batches == 1
        assert srv.stats.padded_slots == 3  # lone request still rung 4
        futures = [srv.submit(p, seed=s)
                   for p, s in [("a cat", 7), ("a dog", 2), ("a bird", 3)]]
        crowded = futures[0].result(timeout=120)
    np.testing.assert_array_equal(solo, crowded)


def test_pin_rung_warmup_compiles_only_top_rung(pipe):
    cfg = ServerConfig(batch_size=4, batch_sizes=(1, 2, 4), pin_rung=True,
                       max_wait_ms=1, **CFG)
    srv = GenerationServer(pipe, cfg)
    # monkey-run: count warmup batch sizes via a wrapper
    sizes = []
    orig = srv._run_batch

    def counting(batch):
        sizes.append(len(batch))
        return orig(batch)

    srv._run_batch = counting
    with srv:
        srv.generate("a cat", seed=1)
    # one warmup batch at the top rung (not three), then the real request
    assert sizes == [4, 1]


def test_fast_spec_served(pipe):
    """A --fast spec threads through to the pipeline: the served image
    matches a direct pipe(..., fast=FastConfig) call and differs from the
    exact-protocol image."""
    from uce_tpu.diffusion.sampler import FastConfig

    spec = "cfg_interval=1:3,cache=2"
    cfg = ServerConfig(batch_size=1, max_wait_ms=1, fast=spec,
                       num_inference_steps=4, height=32, width=32)
    with GenerationServer(pipe, cfg) as srv:
        served = srv.generate("a cat", seed=7)
    direct = pipe(["a cat"], num_inference_steps=4, seed=[7], height=32,
                  width=32, negative_prompt=[""],
                  fast=FastConfig.from_spec(spec))
    np.testing.assert_array_equal(served, direct[0])
    exact = pipe(["a cat"], num_inference_steps=4, seed=[7], height=32,
                 width=32, negative_prompt=[""])
    assert (served != exact[0]).any()


def test_fast_spec_rejected_for_family_without_fast(pipe):
    """start() must fail fast when the pipeline family takes no fast
    kwarg (mirrors the scheduler-override guard)."""
    class NoFastPipe:
        def __call__(self, prompt, num_inference_steps, guidance_scale,
                     num_images_per_prompt, seed, height, width):
            raise AssertionError("should not run")

    srv = GenerationServer(
        NoFastPipe(), ServerConfig(batch_size=1, warmup=False,
                                   fast="cache=2", **CFG))
    with pytest.raises(ValueError, match="fast"):
        srv.start()


def test_meshed_pipeline_served(pipe):
    """'uce serve --mesh data=N,model=M' path: a tensor+data-parallel
    pipeline behind the batching server returns images matching the
    single-device pipeline within compiled-program rounding."""
    import copy

    from uce_tpu.parallel import mesh as mesh_mod

    tp = copy.copy(pipe)
    tp.apply_mesh(mesh_mod.make_mesh(n_data=2, n_model=4))
    cfg = ServerConfig(batch_size=2, max_wait_ms=1, **CFG)
    with GenerationServer(tp, cfg) as srv:
        served = srv.generate("a cat", seed=7)
    direct = pipe(["a cat"], num_inference_steps=2, seed=[7], height=32,
                  width=32, negative_prompt=[""])
    assert np.abs(served.astype(int) - direct[0].astype(int)).max() <= 1


def test_mesh_fast_ladder_pin_rung_compose_under_saturation(pipe):
    """The r5 composition soak (VERDICT r4 weak #6): --mesh + --fast +
    batch ladder + --pin_rung all at once, at saturation. Asserts
    (a) per-request determinism — each (prompt, seed) resubmitted in a
    differently-crowded batch returns a BIT-identical image (pin_rung's
    contract even though rung padding x sharded batch x DeepCache
    boundary interact), (b) every future completes, (c) the server shuts
    down cleanly with requests in flight right up to close()."""
    import copy

    from uce_tpu.diffusion.sampler import FastConfig
    from uce_tpu.parallel import mesh as mesh_mod

    tp = copy.copy(pipe)
    tp.apply_mesh(mesh_mod.make_mesh(n_data=2, n_model=4))
    spec = "cfg_interval=1:2,cache=2"
    cfg = ServerConfig(batch_size=4, batch_sizes=(1, 2, 4), pin_rung=True,
                       fast=spec, max_wait_ms=150, **CFG)
    reqs = [("a cat", 7), ("a dog", 2), ("a bird", 3), ("a fish", 4),
            ("a cat", 7), ("a horse", 5), ("a cat", 7)]
    with GenerationServer(tp, cfg) as srv:
        futures = [srv.submit(p, seed=s) for p, s in reqs]
        images = [f.result(timeout=300) for f in futures]
        assert srv.stats.batches >= 2  # saturation: multiple batches ran
    # (a) the three "a cat"/7 submissions landed in different batch
    # occupancies; pin_rung must make them bit-identical anyway
    cats = [img for (p, s), img in zip(reqs, images) if (p, s) == ("a cat", 7)]
    np.testing.assert_array_equal(cats[0], cats[1])
    np.testing.assert_array_equal(cats[0], cats[2])
    # (b) distinct requests produced distinct images (not a stuck buffer)
    assert (cats[0] != images[1]).any()
    # fast spec really was applied: differs from the exact-path image
    exact = pipe(["a cat"], num_inference_steps=2, seed=[7], height=32,
                 width=32, negative_prompt=[""],)
    assert (cats[0] != exact[0]).any()

    # (c) shutdown race: close() with a request still queued must either
    # serve it or fail it cleanly — never hang
    srv2 = GenerationServer(copy.copy(tp), cfg)
    with srv2:
        tail_futures = [srv2.submit(f"prompt {i}", seed=i) for i in range(5)]
    for f in tail_futures:
        try:
            img = f.result(timeout=60)
            assert img.shape == (32, 32, 3)
        except Exception:
            pass  # a clean failure is acceptable; a hang is not
