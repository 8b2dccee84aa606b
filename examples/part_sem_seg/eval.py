"""Category evaluation + qualitative export for trained PartNet checkpoints.

Rebuild of `examples/part_sem_seg/eval.py:1-160`: load a checkpoint, run the
test phase of one category, report mean part IoU + shape mIoU (the protocol of
`main.py:102-148`), and write per-object colored point clouds
`{category}_{i}_pred.obj` / `{category}_{i}_gt.obj` ('v x y z r g b' lines, the
format `visualize.py` consumes).  The reference's fixed 54-color table is
replaced by a procedural HSV wheel (same role: one distinct color per part id).

Run: python examples/part_sem_seg/eval.py --synthetic \
        --pretrained_model <exp>/ckpt_best --res_dir <out>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
import main as train_main  # noqa: E402


def class_color(c: int, n: int):
    """Distinct color per part id (HSV wheel; reference used a fixed table)."""
    import colorsys

    h = (c / max(n, 1)) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85 if c % 2 else 1.0,
                                  1.0 if c % 3 else 0.7)
    return int(r * 255), int(g * 255), int(b * 255)


def write_colored_obj(path: str, pts, labels, n_classes: int):
    """'v x y z r g b' per point (reference `eval.py:95-112` output format)."""
    with open(path, "w") as f:
        for p, c in zip(pts, labels):
            r, g, b = class_color(int(c), n_classes)
            f.write(f"v {p[0]:f} {p[1]:f} {p[2]:f} {r} {g} {b}\n")
    return path


def main(argv=None):
    args = train_main.get_args(argv)
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import part_seg_miou

    rng = np.random.default_rng(args.seed)
    te_x, te_y = train_main.load_phase(args, rng, "test")

    model = train_main.build_model(args)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")

    @jax.jit
    def predict(params, state, x):
        logits, _ = model.apply(params, state, x, train=False)
        return jnp.argmax(logits, -1)

    res_dir = args.res_dir or "partseg_results"
    os.makedirs(res_dir, exist_ok=True)
    bs = min(args.batch_size, len(te_x))
    n_eval = len(te_x)
    pad = (-n_eval) % bs  # cover the trailing partial batch; trim after
    te_pad = np.concatenate([te_x, te_x[-1:].repeat(pad, 0)]) if pad else te_x
    preds = []
    for lo in range(0, len(te_pad), bs):
        preds.append(np.asarray(predict(params, state,
                                        jnp.asarray(te_pad[lo:lo + bs]))))
    preds = np.concatenate(preds)[:n_eval]
    part_iou, shape_miou = part_seg_miou(preds, te_y[:n_eval], args.n_classes)
    print(f"{args.category}: mean part IoU {part_iou:.4f}  "
          f"shape mIoU {shape_miou:.4f}  ({n_eval} objects)")

    for i in range(min(n_eval, args.max_export)):
        write_colored_obj(
            os.path.join(res_dir, f"{args.category}_{i}_pred.obj"),
            te_x[i], preds[i], args.n_classes)
        write_colored_obj(
            os.path.join(res_dir, f"{args.category}_{i}_gt.obj"),
            te_x[i], te_y[i], args.n_classes)
    print(f"wrote qualitative exports to {res_dir}")
    return part_iou, shape_miou


if __name__ == "__main__":
    main()
