"""ir2rgb-serve network daemon (infer/server.py): the TCP protocol,
batching tick loop, per-connection carry isolation, JPEG wire mode,
error paths, and the CLI entry point end-to-end in a subprocess."""

import os
import subprocess
import sys
import threading
import time

import jax
import numpy as np
import pytest

from ir2rgb_tpu.config import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from ir2rgb_tpu.infer import MultiStreamServer, StreamingGenerator
from ir2rgb_tpu.infer.server import FrameClient, FrameServer
from ir2rgb_tpu.train import create_model


def _model(temporal=True):
    cfg = Config(
        model=ModelConfig(model="temporal" if temporal else "pix2pix",
                          net_g="resnet_6blocks", net_d="n_layers",
                          ngf=8, ndf=8, n_frames_g=2),
        data=DataConfig(crop_size=32),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)
    g_params = model.g_init(jax.random.PRNGKey(0))
    return model, g_params


def _frames(seed, n, smooth=False):
    if smooth:  # JPEG-friendly for wire-codec tests
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
        return [np.stack([(xx * 4 + 9 * t) % 256, (yy * 4) % 256,
                          (xx + yy + 5 * t) % 256, ], -1).astype(np.uint8)
                for t in range(n)]
    rng = np.random.RandomState(seed)
    return [(rng.rand(32, 32, 3) * 255).astype(np.uint8)
            for _ in range(n)]


def _assert_lsb(a, b, tol=1):
    assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= tol


@pytest.fixture(scope="module")
def served():
    """One running FrameServer shared by the in-process tests."""
    model, g_params = _model()
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=4)
    fs = FrameServer(srv, port=0, tick_ms=2.0)
    fs.start()
    yield fs, model, g_params
    fs.stop()


def test_single_client_matches_streaming_generator(served):
    fs, model, g_params = served
    frames = _frames(1, 4)
    ref_s = StreamingGenerator(model, g_params, (32, 32))
    ref = [ref_s.push(f) for f in frames]
    with FrameClient("127.0.0.1", fs.port) as c:
        assert c.frame_hw == (32, 32)
        assert (c.in_nc, c.out_nc) == (3, 3)
        for f, r in zip(frames, ref):
            _assert_lsb(c.push(f), r)


def test_two_clients_batched_with_isolated_carries(served):
    """Two concurrent connections: each stream's outputs equal its own
    dedicated single-stream run (temporal carries never mix), while the
    server batches their frames into shared ticks."""
    fs, model, g_params = served
    fa, fb = _frames(2, 3), _frames(3, 3)
    ref = {}
    for k, frames in (("a", fa), ("b", fb)):
        s = StreamingGenerator(model, g_params, (32, 32))
        ref[k] = [s.push(f) for f in frames]
    ca = FrameClient("127.0.0.1", fs.port)
    cb = FrameClient("127.0.0.1", fs.port)
    try:
        for t in range(3):
            # send both before receiving either so the tick loop can
            # batch them into one step
            ca.send(fa[t])
            cb.send(fb[t])
            _assert_lsb(ca.recv(), ref["a"][t])
            _assert_lsb(cb.recv(), ref["b"][t])
    finally:
        ca.close()
        cb.close()


def test_pipelined_stream(served):
    fs, model, g_params = served
    frames = _frames(4, 5)
    s = StreamingGenerator(model, g_params, (32, 32))
    ref = [s.push(f) for f in frames]
    with FrameClient("127.0.0.1", fs.port) as c:
        outs = list(c.stream(frames))
    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        _assert_lsb(o, r)


def test_reconnect_gets_fresh_carry(served):
    """Closing and reconnecting must restart temporal context — the
    reused slot's carry resets (no bleed from the previous client)."""
    fs, model, g_params = served
    frames = _frames(5, 2)
    with FrameClient("127.0.0.1", fs.port) as c:
        first = [c.push(f) for f in frames]
    with FrameClient("127.0.0.1", fs.port) as c:
        again = [c.push(f) for f in frames]
    for a, b in zip(first, again):
        _assert_lsb(a, b)


def test_bad_frame_size_errors(served):
    fs, _, _ = served
    with FrameClient("127.0.0.1", fs.port) as c:
        c.send(np.zeros((16, 16, 3), np.uint8))
        with pytest.raises(RuntimeError, match="expected 3072"):
            c.recv()


def test_jpeg_wire_mode():
    """JPEG in both directions: lossy but close (smooth frames)."""
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    fs = FrameServer(srv, port=0, encode="jpeg", quality=95, tick_ms=0)
    fs.start()
    try:
        frames = _frames(0, 2, smooth=True)
        ref_srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
        sid = ref_srv.open()
        with FrameClient("127.0.0.1", fs.port, jpeg=True,
                         quality=95) as c:
            assert c.reply_jpeg
            for f in frames:
                out = c.push(f)
                # the reference must see the SAME lossy input the server
                # decoded (a random-weight net amplifies input deltas);
                # the remaining gap is the reply-side JPEG only
                from ir2rgb_tpu.data import native
                jpg = np.frombuffer(native.encode_jpeg(f, 95), np.uint8)
                f_wire = native.decode_jpeg_mem_batch(
                    jpg, np.array([0]), np.array([len(jpg)]), 32, 32)[0]
                ref = ref_srv.step({sid: f_wire})[sid]
                # ... and the expected OUTPUT is the reply-side JPEG
                # round-trip of that reference (a random-weight net
                # emits noise-like frames JPEG can't hold to 30 dB —
                # the codec path, not compressibility, is under test)
                rj = np.frombuffer(native.encode_jpeg(ref, 95), np.uint8)
                expected = native.decode_jpeg_mem_batch(
                    rj, np.array([0]), np.array([len(rj)]), 32, 32)[0]
                err = out.astype(np.float32) - expected.astype(np.float32)
                psnr = 10 * np.log10(255.0 ** 2
                                     / max(float(np.mean(err ** 2)), 1e-9))
                assert psnr > 35, psnr
    finally:
        fs.stop()


def test_slot_exhaustion_refused():
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    fs = FrameServer(srv, port=0, tick_ms=0)
    fs.start()
    try:
        with FrameClient("127.0.0.1", fs.port) as c1:
            c1.push(_frames(1, 1)[0])
            c2 = FrameClient("127.0.0.1", fs.port)
            with pytest.raises(RuntimeError, match="slots busy"):
                c2.send(_frames(2, 1)[0])
                c2.recv()
        # after c1 closes, the slot frees up for a new connection
        import time
        deadline = time.time() + 5
        while time.time() < deadline:
            c3 = FrameClient("127.0.0.1", fs.port)
            try:
                c3.push(_frames(3, 1)[0])
                break
            except RuntimeError:
                c3.close()
                time.sleep(0.05)
        else:
            pytest.fail("slot never freed after client close")
        c3.close()
    finally:
        fs.stop()


def test_serve_cli_e2e(tmp_path):
    """ir2rgb-serve end-to-end: subprocess with --torch_g weights, a
    client pushes frames, clean shutdown."""
    import torch

    import torch_refs
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    ckpt = str(tmp_path / "latest_net_G.pth")
    torch.save(t.state_dict(), ckpt)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.Popen(
        [sys.executable, "-m", "ir2rgb_tpu.cli.serve",
         "--model.model", "pix2pix",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--model.ndf", "8", "--loss.no_vgg_loss", "true",
         "--data.crop_size", "32",
         "--infer.serve_port", "0", "--infer.serve_slots", "2",
         "--torch_g", ckpt],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo", env=env)
    try:
        line = proc.stdout.readline()
        assert "serving pix2pix/resnet_6blocks at" in line, line
        port = int(line.split(" at ")[1].split()[0].rsplit(":", 1)[1])
        with FrameClient("127.0.0.1", port, timeout=300) as c:
            out = c.push(_frames(7, 1)[0])
        assert out.shape == (32, 32, 3)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_frame_then_instant_disconnect_keeps_server_alive(served):
    """A client that sends a frame and vanishes without reading the
    reply must not kill the tick loop (frame+close can drain in one
    tick; the closed connection's parked frames are dropped)."""
    fs, model, g_params = served
    import socket as _socket
    from ir2rgb_tpu.infer.server import _HDR, _HELLO, _recv_exact
    s = _socket.create_connection(("127.0.0.1", fs.port), timeout=30)
    _recv_exact(s, _HELLO.size)
    payload = np.zeros(32 * 32 * 3, np.uint8).tobytes()
    s.sendall(_HDR.pack(b"FRMR", len(payload)) + payload)
    s.close()  # no recv — close races the tick
    # the server must still serve a fresh client afterwards
    frames = _frames(8, 2)
    ref_s = StreamingGenerator(model, g_params, (32, 32))
    ref = [ref_s.push(f) for f in frames]
    with FrameClient("127.0.0.1", fs.port) as c:
        for f, r in zip(frames, ref):
            _assert_lsb(c.push(f), r)


def test_connect_and_reset_does_not_leak_slots():
    """Peers that vanish before the hello reaches them must not leak
    slots (no reader thread exists to emit the close event)."""
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    fs = FrameServer(srv, port=0, tick_ms=0)
    fs.start()
    try:
        import socket as _socket
        import time
        for _ in range(4):  # > n_slots abrupt connects
            s = _socket.create_connection(("127.0.0.1", fs.port))
            # RST instead of FIN: SO_LINGER with zero timeout
            s.setsockopt(_socket.SOL_SOCKET, _socket.SO_LINGER,
                         __import__("struct").pack("ii", 1, 0))
            s.close()
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                with FrameClient("127.0.0.1", fs.port) as c:
                    out = c.push(_frames(9, 1)[0])
                assert out.shape == (32, 32, 3)
                break
            except (RuntimeError, ConnectionError):
                time.sleep(0.1)
        else:
            pytest.fail("slot leaked: server refuses clients after "
                        "connect-and-reset peers")
    finally:
        fs.stop()


def test_pop_flag_missing_value_is_usage_error():
    from ir2rgb_tpu.cli.common import pop_flag
    argv = ["--model.ngf", "8", "--torch_g"]
    with pytest.raises(SystemExit, match="requires a value"):
        pop_flag(argv, "--torch_g")


# ------------------------------------------------- multistream artifacts


def test_multistream_artifact_matches_live_server(tmp_path):
    """A sealed multi-stream artifact serves identically to the live
    MultiStreamServer: batched ticks, carry holds on skipped slots,
    reset on slot reuse — with no model behind it (srv.model is None)."""
    from ir2rgb_tpu.infer import export_multistream_artifact
    model, g_params = _model()
    path = str(tmp_path / "ms.ir2rgb")
    export_multistream_artifact(model, g_params, (32, 32), path,
                                n_slots=3, platforms=("cpu",))

    live = MultiStreamServer(model, g_params, (32, 32), n_slots=3)
    sealed = MultiStreamServer.from_artifact(path)
    assert sealed.model is None
    assert sealed.physical_slots == 3 and sealed.n_slots == 3
    assert (sealed.in_nc, sealed.out_nc) == (3, 3)

    fa, fb = _frames(20, 3), _frames(21, 3)
    la, lb = live.open(), live.open()
    sa, sb = sealed.open(), sealed.open()
    # tick 0: both streams; tick 1: only a (b holds carry); tick 2: both
    feeds = [{0: fa[0], 1: fb[0]}, {0: fa[1]}, {0: fa[2], 1: fb[1]}]
    for feed in feeds:
        lo = live.step({(la if k == 0 else lb): v for k, v in feed.items()})
        so = sealed.step({(sa if k == 0 else sb): v
                          for k, v in feed.items()})
        for k in feed:
            _assert_lsb(lo[la if k == 0 else lb], so[sa if k == 0 else sb])
    # close + reopen: fresh carry on the reused slot, both servers
    live.close(lb), sealed.close(sb)
    lb2, sb2 = live.open(), sealed.open()
    lo = live.step({lb2: fb[2]})
    so = sealed.step({sb2: fb[2]})
    _assert_lsb(lo[lb2], so[sb2])


def test_multistream_artifact_loader_guards(tmp_path):
    from ir2rgb_tpu.infer import (
        export_multistream_artifact,
        export_serving_artifact,
        load_multistream_artifact,
        load_serving_artifact,
    )
    model, g_params = _model(temporal=False)
    single = str(tmp_path / "single.ir2rgb")
    multi = str(tmp_path / "multi.ir2rgb")
    export_serving_artifact(model, g_params, (32, 32), single,
                            platforms=("cpu",))
    export_multistream_artifact(model, g_params, (32, 32), multi,
                                n_slots=2, platforms=("cpu",))
    with pytest.raises(ValueError, match="MULTI-STREAM artifact"):
        load_serving_artifact(multi)
    with pytest.raises(ValueError, match="single-stream artifact"):
        load_multistream_artifact(single)
    with pytest.raises(ValueError, match="exceeds the artifact"):
        MultiStreamServer.from_artifact(multi, n_slots=5)
    with pytest.raises(ValueError, match="must be >= 1"):
        MultiStreamServer.from_artifact(multi, n_slots=0)
    # clamp=True (the CLI's forgiving mode): a cap above the sealed
    # batch serves every sealed slot instead of raising
    srv = MultiStreamServer.from_artifact(multi, n_slots=5, clamp=True)
    assert srv.n_slots == 2 and srv.physical_slots == 2


def test_serve_cli_artifact_e2e(tmp_path):
    """ir2rgb-export --slots -> ir2rgb-serve --artifact -> client."""
    from ir2rgb_tpu.infer import export_multistream_artifact
    model, g_params = _model(temporal=False)
    art = str(tmp_path / "m.ir2rgb")
    export_multistream_artifact(model, g_params, (32, 32), art,
                                n_slots=2, platforms=("cpu",))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.Popen(
        [sys.executable, "-m", "ir2rgb_tpu.cli.serve",
         "--infer.serve_port", "0", "--artifact", art],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo", env=env)
    try:
        line = proc.stdout.readline()
        assert "serving artifact m.ir2rgb at" in line, line
        port = int(line.split(" at ")[1].split()[0].rsplit(":", 1)[1])
        ref = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
        sid = ref.open()
        with FrameClient("127.0.0.1", port, timeout=300) as c:
            for f in _frames(30, 2):
                _assert_lsb(c.push(f), ref.step({sid: f})[sid])
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_export_cli_slots_flag(tmp_path):
    """ir2rgb-export --slots produces a loadable multistream artifact."""
    import torch

    import torch_refs
    from ir2rgb_tpu.infer import load_multistream_artifact
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    ckpt = str(tmp_path / "latest_net_G.pth")
    torch.save(t.state_dict(), ckpt)
    art = str(tmp_path / "cli.ir2rgb")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.export",
         "--model.model", "pix2pix",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--model.ndf", "8", "--loss.no_vgg_loss", "true",
         "--data.crop_size", "32",
         "--torch_g", ckpt, "--out", art,
         "--slots", "2", "--platforms", "cpu"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multistream slots 2" in out.stdout
    _, _, meta = load_multistream_artifact(art)
    assert meta["batch"] == 2 and meta["multistream"]


def test_stats_message(served):
    fs, _, _ = served
    with FrameClient("127.0.0.1", fs.port) as c:
        c.push(_frames(40, 1)[0])
        st = c.stats()
    assert st["slots_total"] == 4
    assert st["frames_served"] >= 1 and st["ticks_served"] >= 1
    assert st["slots_active"] >= 1  # this connection holds a slot


def test_stats_with_frames_in_flight(served):
    """stats() composes with pipelining: the STAT reply may overtake or
    trail in-flight frame outputs; either way every frame's output is
    still delivered, in order."""
    fs, _, _ = served
    fr = _frames(41, 3)
    with FrameClient("127.0.0.1", fs.port) as c:
        for f in fr:
            c.send(f)
        st = c.stats()  # races the 3 in-flight frames by design
        outs = [c.recv() for _ in range(3)]
    assert st["slots_total"] == 4
    assert all(o.shape == (32, 32, 3) for o in outs)
    # the batched step is deterministic per (slot, carry): replaying the
    # same frames on a fresh connection must reproduce the outputs,
    # proving stats() didn't swallow or reorder any
    with FrameClient("127.0.0.1", fs.port) as c:
        outs2 = [c.push(f) for f in fr]
    for a, b in zip(outs, outs2):
        _assert_lsb(a, b)


def test_thin_client_imports_no_framework(tmp_path):
    """The protocol client and video IO import without the model stack
    (lazy package __init__s) — the thin-deployment claim in
    examples/serve_video.py."""
    code = (
        "import sys\n"
        "import ir2rgb_tpu.infer.server, ir2rgb_tpu.data.video, "
        "ir2rgb_tpu.obs.video\n"
        "heavy = [m for m in sys.modules if m.startswith('ir2rgb_tpu')"
        " and any(k in m for k in ('loader', 'transforms', 'stream',"
        " 'multistream', 'export', 'train', 'nn.', 'checkpoint'))]\n"
        "assert not heavy, heavy\n"
        "assert 'torch' not in sys.modules\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, env=env,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-1500:]


def test_backpressure_transparent():
    """A pipelining client that outruns the tick loop is throttled by
    flow-control credits (reader stops reading its socket), never
    errored or dropped: every frame's output still arrives, in order,
    even far past max_pending."""
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    fs = FrameServer(srv, port=0, tick_ms=0.0, max_pending=2)
    fs.start()
    try:
        fr = _frames(77, 12)
        with FrameClient("127.0.0.1", fs.port) as c:
            for f in fr:
                c.send(f)           # 12 frames deep, credits allow 2
            st = c.stats()          # STAT carries no credit: no deadlock
            outs = [c.recv() for _ in range(12)]
        assert st["slots_total"] == 2
        with FrameClient("127.0.0.1", fs.port) as c:
            outs2 = [c.push(f) for f in fr]
        for a, b in zip(outs, outs2):
            _assert_lsb(a, b)
    finally:
        fs.stop()


def test_lone_connection_skips_batching_window():
    """With a single attached connection the batching window is pure
    added latency (nobody else's frame can join) — the tick loop must
    skip it (round 5). tick_ms is set absurdly high so a regression
    shows up as a multi-second stall, not a flaky few-ms delta."""
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    fs = FrameServer(srv, port=0, tick_ms=1500.0)
    fs.start()
    try:
        fr = _frames(31, 4)
        with FrameClient("127.0.0.1", fs.port) as c:
            c.push(fr[0])  # warm-up: compile outside the timed region
            t0 = time.perf_counter()
            for f in fr[1:]:
                c.push(f)
            assert time.perf_counter() - t0 < 1.5, (
                "lone-connection frames waited the batching window")
    finally:
        fs.stop()


def test_window_exits_when_every_connection_contributed():
    """With N connections the window must close as soon as all N have a
    frame in — waiting out the full tick_ms cannot improve the batch."""
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    fs = FrameServer(srv, port=0, tick_ms=3000.0)
    fs.start()
    try:
        fr = _frames(32, 2)
        with FrameClient("127.0.0.1", fs.port) as a, \
                FrameClient("127.0.0.1", fs.port) as b:
            outs = {}

            def push(name, cli):
                outs[name] = cli.push(fr[0])

            # warm-up round compiles the batched step (both arrive, so
            # the window exits on the all-contributed condition too)
            ts = [threading.Thread(target=push, args=(n, c))
                  for n, c in (("a", a), ("b", b))]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            # generous bound: CPU compile of the 32px step dominates,
            # but a full-window wait would add 3 s on top per round
            warm = time.perf_counter() - t0
            ts = [threading.Thread(target=push, args=(n, c))
                  for n, c in (("a", a), ("b", b))]
            t1 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert time.perf_counter() - t1 < 2.0, (
                f"window did not exit early (warm-up {warm:.1f}s)")
            assert outs["a"].shape == (32, 32, 3)
    finally:
        fs.stop()


def test_frameserver_rejects_bad_max_pending():
    model, g_params = _model(temporal=False)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    with pytest.raises(ValueError, match="max_pending"):
        FrameServer(srv, port=0, max_pending=0)


def test_lazy_exports_cache_into_module():
    """A lazily-resolved package attribute is bound into the module
    namespace, so later accesses skip __getattr__ entirely."""
    import ir2rgb_tpu.data as d
    vars(d).pop("make_dataset", None)
    assert "make_dataset" not in vars(d)
    first = d.make_dataset
    assert "make_dataset" in vars(d)
    assert d.make_dataset is first
    with pytest.raises(AttributeError, match="no attribute"):
        d.not_an_export


def test_serve_cli_artifact_flag_refusals(tmp_path):
    from ir2rgb_tpu.cli.serve import main
    art = str(tmp_path / "x.ir2rgb")  # never opened: refusals come first
    with pytest.raises(SystemExit, match="use_ema has no effect"):
        main(["--artifact", art, "--infer.use_ema", "true"])
    with pytest.raises(SystemExit, match="which_epoch has no effect"):
        main(["--artifact", art, "--infer.which_epoch", "30"])
    with pytest.raises(SystemExit, match="quant has no effect"):
        main(["--artifact", art, "--infer.quant", "int8"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--artifact", art, "--torch_g", "g.pth"])


def test_export_cli_batch_slots_exclusive():
    from ir2rgb_tpu.cli.export import main
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--batch", "4", "--slots", "8"])


def test_export_cli_flag_validation():
    from ir2rgb_tpu.cli.export import main
    with pytest.raises(SystemExit, match="must be >= 1"):
        main(["--slots", "0"])
    with pytest.raises(SystemExit, match="expects an integer"):
        main(["--slots", "x8"])
    with pytest.raises(SystemExit, match="must be >= 1"):
        main(["--batch", "-1"])


def test_multistream_artifact_version_guards_old_loaders(tmp_path):
    """Multi-stream artifacts carry format v2 so a pre-multistream
    loader (which knows only v1) refuses them cleanly."""
    from ir2rgb_tpu.infer import export_multistream_artifact
    from ir2rgb_tpu.infer.export import _read_artifact
    model, g_params = _model(temporal=False)
    p = str(tmp_path / "m.ir2rgb")
    export_multistream_artifact(model, g_params, (32, 32), p,
                                n_slots=2, platforms=("cpu",))
    _, _, meta = _read_artifact(p)
    assert meta["format_version"] == 2
