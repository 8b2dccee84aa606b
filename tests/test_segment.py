import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.ops import segment as seg
from np_ref import gen_aggregate_ref, random_graph, scatter_ref, scatter_softmax_ref


@pytest.mark.parametrize("name", ["sum", "mean", "max", "min"])
def test_scatter_matches_torch_scatter_semantics(rng_np, name):
    x, s, r = random_graph(rng_np, 50, 300, 8)
    msgs = x[s]
    got = np.asarray(seg.scatter(name, jnp.asarray(msgs), jnp.asarray(r), 50))
    want = scatter_ref(name, msgs, r, 50)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_empty_segments_zero(rng_np):
    # node 0 and node 49 have no in-edges
    r = np.full(10, 25, np.int32)
    msgs = -np.abs(rng_np.standard_normal((10, 4)).astype(np.float32)) - 1
    for name in ["sum", "mean", "max", "min"]:
        got = np.asarray(seg.scatter(name, jnp.asarray(msgs), jnp.asarray(r), 50))
        assert np.all(got[0] == 0) and np.all(got[49] == 0)
    # all-negative messages: max of filled segment stays negative (true max, no clamp)
    got = np.asarray(seg.scatter("max", jnp.asarray(msgs), jnp.asarray(r), 50))
    assert np.all(got[25] < 0)


def test_segment_softmax(rng_np):
    x, s, r = random_graph(rng_np, 40, 200, 6)
    msgs = x[s] * 3.0
    got = np.asarray(seg.segment_softmax(jnp.asarray(msgs), jnp.asarray(r), 40))
    want = scatter_softmax_ref(msgs, r, 40)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # weights sum to 1 per non-empty (segment, channel)
    sums = scatter_ref("sum", got, r, 40)
    nonempty = np.bincount(r, minlength=40) > 0
    np.testing.assert_allclose(sums[nonempty], 1.0, rtol=1e-5)


@pytest.mark.parametrize("aggr", ["softmax", "softmax_sg", "softmax_sum", "power",
                                  "power_sum", "add", "mean", "max"])
def test_generalized_aggregate(rng_np, aggr):
    x, s, r = random_graph(rng_np, 30, 150, 5)
    msgs = np.maximum(x[s], 0) + 1e-7  # GENConv message form
    got = np.asarray(seg.generalized_aggregate(
        jnp.asarray(msgs), jnp.asarray(r), 30, aggr=aggr, t=1.3, p=1.7, y=0.2))
    want = gen_aggregate_ref(msgs, r, 30, aggr=aggr, t=1.3, p=1.7, y=0.2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_masked_edges_do_not_contribute(rng_np):
    x, s, r = random_graph(rng_np, 20, 100, 4)
    msgs = x[s]
    mask = rng_np.random(100) < 0.7
    for name in ["sum", "mean", "max", "min"]:
        got = np.asarray(seg.scatter(name, jnp.asarray(msgs), jnp.asarray(r), 20,
                                     mask=jnp.asarray(mask)))
        want = scatter_ref(name, msgs[mask], r[mask], 20)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    got = np.asarray(seg.segment_softmax(jnp.asarray(msgs), jnp.asarray(r), 20,
                                         mask=jnp.asarray(mask)))
    want = np.zeros_like(msgs)
    want[mask] = scatter_softmax_ref(msgs[mask], r[mask], 20)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_softmax_sg_stops_gradient(rng_np):
    """learn_t=False must treat softmax weights as constants (torch.no_grad parity,
    `gcn_lib/sparse/torch_message.py:51-58`)."""
    x, s, r = random_graph(rng_np, 10, 60, 3)
    msgs = jnp.asarray(np.maximum(x[s], 0) + 1e-7)
    rj = jnp.asarray(r)

    def loss_sg(m):
        return seg.generalized_aggregate(m, rj, 10, aggr="softmax", t=2.0,
                                         learn_t=False).sum()

    def loss_full(m):
        return seg.generalized_aggregate(m, rj, 10, aggr="softmax", t=2.0,
                                         learn_t=True).sum()

    g_sg = jax.grad(loss_sg)(msgs)
    g_full = jax.grad(loss_full)(msgs)
    # with stop-grad, d(sum m*w)/dm = w exactly
    w = scatter_softmax_ref(np.asarray(msgs) * 2.0, r, 10)
    np.testing.assert_allclose(np.asarray(g_sg), w, rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(g_full), w)


def test_segment_max_grad_scatter_free(rng_np):
    """The scatter-free segment_max VJP == autodiff of jax.ops.segment_max
    (unique maxima), routes nothing to masked/padding entries, and splits
    evenly on exact ties."""
    import jax
    import jax.numpy as jnp
    from deep_gcns_torch_tpu.ops.segment import segment_max

    e, n, c = 64, 8, 5
    ids = np.sort(rng_np.integers(0, n, e)).astype(np.int32)
    data = rng_np.standard_normal((e, c)).astype(np.float32)
    g = rng_np.standard_normal((n, c)).astype(np.float32)

    def ours(d):
        return jnp.sum(segment_max(d, jnp.asarray(ids), n) * g)

    def ref(d):
        out = jax.ops.segment_max(d, jnp.asarray(ids), n, indices_are_sorted=True)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0) * g)

    np.testing.assert_allclose(np.asarray(jax.grad(ours)(jnp.asarray(data))),
                               np.asarray(jax.grad(ref)(jnp.asarray(data))),
                               rtol=1e-6, atol=1e-6)
    # exact tie: both entries get half the cotangent
    d2 = jnp.asarray(np.array([[1.0], [1.0], [0.5]], np.float32))
    ids2 = jnp.asarray(np.array([0, 0, 0], np.int32))
    gr = jax.grad(lambda d: jnp.sum(segment_max(d, ids2, 1) * 2.0))(d2)
    np.testing.assert_allclose(np.asarray(gr)[:, 0], [1.0, 1.0, 0.0])
    # sentinel-padded ids get zero gradient
    ids3 = jnp.asarray(np.array([0, 0, 1], np.int32))
    gr3 = jax.grad(lambda d: jnp.sum(segment_max(d, ids3, 1)))(d2)
    assert float(gr3[2, 0]) == 0.0


@pytest.mark.parametrize("aggr", ["sum", "mean", "max", "min", "softmax",
                                  "softmax_sg", "softmax_sum", "power"])
def test_generalized_aggregate_split_matches_joint(rng_np, aggr):
    """Partial aggregation over two edge sets + exact combine == single-set
    aggregation (the halo-overlap enabler, SURVEY §7 hard-part 4) — forward
    AND gradients (d msgs, d t)."""
    from deep_gcns_torch_tpu.ops.segment import (generalized_aggregate,
                                                 generalized_aggregate_split)

    n, e = 40, 400
    r = np.sort(rng_np.integers(0, n, e)).astype(np.int32)
    msgs = jnp.asarray(rng_np.standard_normal((e, 8)).astype(np.float32))
    # split edges into two receiver-sorted parts (interleaved to be adversarial)
    pick = rng_np.random(e) < 0.6
    ia, ib = np.flatnonzero(pick), np.flatnonzero(~pick)
    t = jnp.asarray(0.8, jnp.float32)
    learn_t = aggr in ("softmax", "softmax_sum")

    def joint(m, t_):
        return generalized_aggregate(m, jnp.asarray(r), n, aggr=aggr, t=t_,
                                     y=0.3, learn_t=learn_t)

    def split(m, t_):
        parts = [(m[ia], jnp.asarray(r[ia]), None, None),
                 (m[ib], jnp.asarray(r[ib]), None, None)]
        return generalized_aggregate_split(parts, n, aggr=aggr, t=t_, y=0.3,
                                           learn_t=learn_t)

    o1, o2 = joint(msgs, t), split(msgs, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5,
                               atol=2e-6)
    co = jnp.asarray(rng_np.standard_normal(o1.shape).astype(np.float32))
    g1 = jax.grad(lambda m, t_: jnp.sum(joint(m, t_) * co), argnums=(0, 1))(msgs, t)
    g2 = jax.grad(lambda m, t_: jnp.sum(split(m, t_) * co), argnums=(0, 1))(msgs, t)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=2e-4,
                               atol=2e-5)


def test_generalized_aggregate_split_empty_segment_extremes(rng_np):
    """A segment empty in one part but negative-valued in the other must not be
    zero-clamped early (max) — and fully empty segments come out 0."""
    from deep_gcns_torch_tpu.ops.segment import generalized_aggregate_split

    n = 6
    # part A: edges into segments 0,1 with negative values; part B: segment 1 only
    ra = jnp.asarray(np.array([0, 0, 1], np.int32))
    ma = jnp.asarray(np.array([[-3.0], [-1.0], [-5.0]], np.float32))
    rb = jnp.asarray(np.array([1], np.int32))
    mb = jnp.asarray(np.array([[-2.0]], np.float32))
    out = generalized_aggregate_split(
        [(ma, ra, None, None), (mb, rb, None, None)], n, aggr="max")
    np.testing.assert_allclose(np.asarray(out[:2, 0]), [-1.0, -2.0])
    np.testing.assert_allclose(np.asarray(out[2:, 0]), 0.0)
