import os

import numpy as np

from deep_gcns_torch_tpu.utils import metrics as M
from deep_gcns_torch_tpu.utils.ckpt import load_ckpt, save_best, save_ckpt
from deep_gcns_torch_tpu.utils.pc_export import export_part_seg_comparison, write_ply


def test_roc_auc_and_ap(rng_np):
    y = (rng_np.random(500) < 0.3).astype(float)
    s_good = y + 0.3 * rng_np.standard_normal(500)
    assert M.roc_auc(s_good, y) > 0.8
    assert 0.45 < M.roc_auc(rng_np.random(500), y) < 0.55
    assert M.average_precision(s_good, y) > M.average_precision(
        rng_np.random(500), y)
    # NaN labels skipped
    y2 = y.copy()
    y2[:100] = np.nan
    assert np.isfinite(M.roc_auc(s_good, y2))


def test_miou_and_f1():
    pred = np.array([0, 0, 1, 1, 2, 2])
    lab = np.array([0, 1, 1, 1, 2, 0])
    acc = M.IoUAccumulator(3)
    acc.update(pred, lab)
    assert 0 < acc.miou() < 1
    assert abs(M.micro_f1(np.array([1.0, -1.0, 1.0]), np.array([1, 0, 0])) - 2 / 3) < 1e-9
    assert M.hits_at_k(np.array([5.0, 0.1]), np.arange(100) / 100, 10) == 0.5


def test_ckpt_roundtrip(tmp_path, rng_np):
    params = {"a": np.float32(rng_np.standard_normal((4, 3))),
              "b": [np.zeros(2, np.float32), np.ones((1,), np.float32)]}
    opt = {"mu": np.zeros((4, 3), np.float32)}
    path = os.path.join(tmp_path, "ckpt")
    save_ckpt(path, params=params, opt_state=opt, epoch=7, best_value=0.9)
    save_best(path, True)
    p2, _, o2, meta = load_ckpt(path, params_like=params, opt_like=opt)
    np.testing.assert_array_equal(p2["a"], params["a"])
    np.testing.assert_array_equal(o2["mu"], opt["mu"])
    assert meta["epoch"] == 7 and meta["best_value"] == 0.9
    assert os.path.exists(path + "_best.npz")


def test_ply_export(tmp_path, rng_np):
    pts = rng_np.standard_normal((50, 3)).astype(np.float32)
    lab = rng_np.integers(0, 4, 50)
    pred = lab.copy()
    pred[:10] = (pred[:10] + 1) % 4
    paths = export_part_seg_comparison(str(tmp_path), pts, pred, lab, "s0")
    for p in paths:
        head = open(p).read(200)
        assert head.startswith("ply") and "element vertex 50" in head


def test_async_checkpointer_roundtrip(tmp_path):
    """Orbax-backed async save → wait → restore reproduces the pytrees; rolling
    retention keeps max_to_keep steps plus the pinned best."""
    import jax
    import jax.numpy as jnp
    from deep_gcns_torch_tpu.utils.ckpt_async import AsyncCheckpointer

    ck = AsyncCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    p = {"w": jnp.arange(12.0).reshape(3, 4), "b": [jnp.ones((2,)), jnp.zeros((1,))]}
    opt = {"mu": jax.tree.map(jnp.zeros_like, p)}
    for step, v in ((0, 0.9), (1, 0.2), (2, 0.3)):
        ck.save(step, params=jax.tree.map(lambda a, s=step: a + s, p),
                opt_state=opt, metrics={"valid": v}, meta={"epoch": step})
    ck.wait()
    assert ck.latest_step() == 2
    assert ck.best_step() == 0  # best valid=0.9 pinned despite rolling window
    like = {"params": jax.tree.map(jnp.zeros_like, p),
            "opt_state": jax.tree.map(jnp.zeros_like, opt)}
    tree, meta, step = ck.restore(like=like, with_meta=True)
    assert step == 2 and meta["epoch"] == 2
    np.testing.assert_allclose(np.asarray(tree["params"]["w"]),
                               np.arange(12.0).reshape(3, 4) + 2)
    best = ck.restore(ck.best_step(), like=like)
    np.testing.assert_allclose(np.asarray(best["params"]["w"]),
                               np.arange(12.0).reshape(3, 4))
    ck.close()


def test_scalar_logger_histogram_and_mesh(tmp_path, rng_np):
    """Histogram + mesh summaries (the TF1 TfLogger analogs,
    `utils/tf_logger.py:17-110`)."""
    import json

    from deep_gcns_torch_tpu.utils.logger import ScalarLogger

    sl = ScalarLogger(str(tmp_path))
    sl.log(0, loss=1.5)
    sl.log_histogram(0, "grads/w", rng_np.standard_normal(1000), bins=10)
    recs = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    hist = [r for r in recs if r.get("kind") == "histogram"]
    assert len(hist) == 1 and len(hist[0]["counts"]) == 10
    assert sum(hist[0]["counts"]) == 1000
    assert len(hist[0]["edges"]) == 11

    pts = rng_np.standard_normal((50, 3)).astype("float32")
    path = sl.log_mesh(3, "cloud", pts, labels=rng_np.integers(0, 5, 50))
    assert path.endswith("cloud_3.ply")
    assert open(path).read(3) == "ply"
