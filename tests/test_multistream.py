"""Multi-stream batched serving tests: N independent streams through one
compiled step must behave exactly like N separate StreamingGenerators —
including carry holds across skipped ticks, slot reuse with fresh
temporal context, and the pipelined ticks() loop."""

import jax
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.infer import MultiStreamServer, StreamingGenerator
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


def _frames(seed, n):
    rng = np.random.RandomState(seed)
    return [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(n)]


def _assert_lsb(a, b):
    """uint8 results equal within 1 LSB (batched vs batch-1 compute may
    round the final f32->uint8 cast differently)."""
    assert a.dtype == np.uint8 and b.dtype == np.uint8
    assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= 1


def test_multistream_matches_independent_streams():
    model, g_params = _model()
    seqs = {0: _frames(1, 3), 1: _frames(2, 3), 2: _frames(3, 3)}

    ref = {}
    for k, frames in seqs.items():
        s = StreamingGenerator(model, g_params, (32, 32))
        ref[k] = [s.push(f) for f in frames]

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=4)
    sids = {k: srv.open() for k in seqs}
    for t in range(3):
        outs = srv.step({sids[k]: seqs[k][t] for k in seqs})
        for k in seqs:
            _assert_lsb(outs[sids[k]], ref[k][t])


def test_skip_tick_holds_carry():
    """A stream that misses a tick resumes with its temporal context
    intact: serving B's frames at ticks 0 and 2 equals serving them
    back-to-back on a dedicated stream."""
    model, g_params = _model()
    fa, fb = _frames(10, 3), _frames(11, 2)

    s = StreamingGenerator(model, g_params, (32, 32))
    ref_b = [s.push(f) for f in fb]

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    a, b = srv.open(), srv.open()
    o0 = srv.step({a: fa[0], b: fb[0]})
    srv.step({a: fa[1]})                      # b skips this tick
    o2 = srv.step({a: fa[2], b: fb[1]})
    _assert_lsb(o0[b], ref_b[0])
    _assert_lsb(o2[b], ref_b[1])


def test_slot_reuse_resets_carry():
    """close() + open() hands the slot to a new stream with zeroed
    carry — its first frame must match a fresh stream's first frame."""
    model, g_params = _model()
    f = _frames(20, 2)

    s = StreamingGenerator(model, g_params, (32, 32))
    fresh_first = s.push(f[0])

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    sid = srv.open()
    srv.step({sid: f[0]})
    srv.step({sid: f[1]})                     # carry now non-zero
    srv.close(sid)
    sid2 = srv.open()
    assert sid2 == sid                        # same physical slot
    out = srv.step({sid2: f[0]})
    _assert_lsb(out[sid2], fresh_first)


def test_ticks_pipelined_matches_step():
    model, g_params = _model()
    seq_a, seq_b = _frames(30, 4), _frames(31, 4)

    srv1 = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    a1, b1 = srv1.open(), srv1.open()
    seq_out = [srv1.step({a1: seq_a[t], b1: seq_b[t]}) for t in range(4)]

    srv2 = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    a2, b2 = srv2.open(), srv2.open()
    feed = [{a2: seq_a[t], b2: seq_b[t]} for t in range(4)]
    piped = list(srv2.ticks(feed))

    assert len(piped) == 4
    for got, want in zip(piped, seq_out):
        np.testing.assert_array_equal(got[a2], want[a1])
        np.testing.assert_array_equal(got[b2], want[b1])


def test_slot_exhaustion_and_unknown_slot():
    model, g_params = _model()
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    sid = srv.open()
    with pytest.raises(RuntimeError, match="slots busy"):
        srv.open()
    with pytest.raises(KeyError, match="unattached"):
        srv.step({sid + 1: _frames(0, 1)[0]})
    srv.close(sid)
    assert srv.open() == sid


def test_physical_slot_padding_exact():
    """physical_slots > n_slots (the TPU batch-cliff workaround: a
    masked batch-8 step beats a native batch-5 step) must not change
    outputs — pad slots are never-valid and never surface."""
    model, g_params = _model()
    seqs = {0: _frames(50, 2), 1: _frames(51, 2), 2: _frames(52, 2)}

    ref = {}
    for k, frames in seqs.items():
        s = StreamingGenerator(model, g_params, (32, 32))
        ref[k] = [s.push(f) for f in frames]

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=3,
                            physical_slots=8)
    assert srv.physical_slots == 8
    sids = {k: srv.open() for k in seqs}
    with pytest.raises(RuntimeError):
        srv.open()  # logical capacity is still 3
    for t in range(2):
        outs = srv.step({sids[k]: seqs[k][t] for k in seqs})
        assert set(outs) == set(sids.values())
        for k in seqs:
            _assert_lsb(outs[sids[k]], ref[k][t])

    from ir2rgb_tpu.infer.multistream import _good_physical_slots
    # capped at the measured knee of 8 (round 5): past 8 a bigger
    # compiled batch loses aggregate fps AND latency vs chained 8-ticks
    assert [_good_physical_slots(n) for n in (1, 2, 3, 7, 8, 9, 16, 17)] \
        == [1, 2, 8, 8, 8, 8, 8, 8]


def test_pooled_chunked_round_robin_matches_streaming():
    """physical_slots < n_slots (round 5: the compiled batch caps at the
    measured knee; extra streams ride chained chunk ticks over a carry
    pool): outputs must be identical to per-stream StreamingGenerators —
    gather/scatter carry pooling, chunk splitting, reset and skip-tick
    hold semantics all exact."""
    model, g_params = _model()
    seqs = {k: _frames(60 + k, 3) for k in range(5)}

    ref = {}
    for k, frames in seqs.items():
        s = StreamingGenerator(model, g_params, (32, 32))
        ref[k] = [s.push(f) for f in frames]

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=5,
                            physical_slots=2)
    assert srv.physical_slots == 2 and srv._pooled
    sids = {k: srv.open() for k in seqs}
    # tick 0: everyone (3 chunks of <=2)
    outs = srv.step({sids[k]: seqs[k][0] for k in seqs})
    for k in seqs:
        _assert_lsb(outs[sids[k]], ref[k][0])
    # tick 1: streams 0 and 3 skip (carry must hold across chunks)
    live = [k for k in seqs if k not in (0, 3)]
    outs = srv.step({sids[k]: seqs[k][1] for k in live})
    assert set(outs) == {sids[k] for k in live}
    for k in live:
        _assert_lsb(outs[sids[k]], ref[k][1])
    # tick 2: the skipped streams resume where they left off
    outs = srv.step({sids[0]: seqs[0][1], sids[3]: seqs[3][1]})
    _assert_lsb(outs[sids[0]], ref[0][1])
    _assert_lsb(outs[sids[3]], ref[3][1])
    # close + reopen gets a FRESH carry through the pool reset path
    srv.close(sids[4])
    nid = srv.open()
    outs = srv.step({nid: seqs[4][0]})
    _assert_lsb(outs[nid], ref[4][0])


def test_pooled_non_temporal_chunks():
    """Stateless models chunk the same way (rows are chunk-local)."""
    model, g_params = _model(temporal=False)
    frames = _frames(70, 5)
    s = StreamingGenerator(model, g_params, (32, 32))
    ref = [s.push(f) for f in frames]
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=5,
                            physical_slots=2)
    sids = [srv.open() for _ in range(5)]
    outs = srv.step({sids[i]: frames[i] for i in range(5)})
    for i in range(5):
        _assert_lsb(outs[sids[i]], ref[i])


def test_pooled_pipelined_ticks_match_step():
    """ticks() pipelining composes with chunked dispatch."""
    model, g_params = _model()
    seqs = {k: _frames(80 + k, 3) for k in range(3)}
    srv1 = MultiStreamServer(model, g_params, (32, 32), n_slots=3,
                             physical_slots=2)
    sids1 = {k: srv1.open() for k in seqs}
    seq_out = [srv1.step({sids1[k]: seqs[k][t] for k in seqs})
               for t in range(3)]
    srv2 = MultiStreamServer(model, g_params, (32, 32), n_slots=3,
                             physical_slots=2)
    sids2 = {k: srv2.open() for k in seqs}
    piped = list(srv2.ticks(
        [{sids2[k]: seqs[k][t] for k in seqs} for t in range(3)]))
    assert len(piped) == 3
    for got, want in zip(piped, seq_out):
        for k in seqs:
            np.testing.assert_array_equal(got[sids2[k]], want[sids1[k]])


def test_pooled_with_mesh_raises():
    model, g_params = _model()
    class FakeMesh:  # never touched — the guard fires first
        pass
    with pytest.raises(ValueError, match="single-chip"):
        MultiStreamServer(model, g_params, (32, 32), n_slots=4,
                          physical_slots=2, mesh=FakeMesh())


def test_non_temporal_batched_serving():
    """Single-frame models serve through the same API (pure batched
    apply, no carry) and match the batch-1 streaming path."""
    model, g_params = _model(temporal=False)
    frames = _frames(40, 3)

    s = StreamingGenerator(model, g_params, (32, 32))
    ref = [s.push(f) for f in frames]

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=3)
    sids = [srv.open() for _ in range(3)]
    outs = srv.step({sids[i]: frames[i] for i in range(3)})
    for i in range(3):
        _assert_lsb(outs[sids[i]], ref[i])


def test_step_device_does_not_donate_caller_frames():
    """step_device must leave the caller's device-resident frames buffer
    alive — a serving/benchmark loop reuses one buffer across ticks
    (review fix: frames were in donate_argnums and the second call hit a
    deleted-buffer error)."""
    import jax.numpy as jnp

    model, g_params = _model(temporal=True)
    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=2)
    frames_dev = jnp.asarray(
        np.stack(_frames(50, srv.physical_slots)))
    out1 = np.asarray(jax.device_get(srv.step_device(frames_dev)))
    out2 = np.asarray(jax.device_get(srv.step_device(frames_dev)))
    assert out1.shape == out2.shape  # second call must not raise


def test_empty_tick_is_free_and_consistent():
    """step({}) returns {} without running the generator; ticks() with
    empty ticks interleaved matches sequential step calls (carries
    hold across empty ticks)."""
    model, g_params = _model()
    fa = _frames(5, 2)

    srv = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    a = srv.open()
    assert srv.step({}) == {}
    o0 = srv.step({a: fa[0]})
    assert srv.step({}) == {}
    o1 = srv.step({a: fa[1]})

    srv2 = MultiStreamServer(model, g_params, (32, 32), n_slots=1)
    a2 = srv2.open()
    feed = [{}, {a2: fa[0]}, {}, {a2: fa[1]}]
    outs = list(srv2.ticks(iter(feed)))
    assert len(outs) == 4
    assert outs[0] == {} and outs[2] == {}
    np.testing.assert_array_equal(outs[1][a2], o0[a])
    np.testing.assert_array_equal(outs[3][a2], o1[a])
