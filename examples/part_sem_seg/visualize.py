"""Qualitative comparison of PartNet predictions across result folders.

Rebuild of `examples/part_sem_seg/visualize.py:1-60` + `utils/pc_viz.py::
visualize_part_seg`: the reference opens an interactive VTK window showing
Ground Truth next to each model's prediction; this image is headless, so the
same comparison is written as ONE combined colored PLY with the clouds offset
side by side along x (open in any viewer).  Consumes the `{category}_{i}_
{pred,gt}.obj` files produced by eval.py from a result tree:

    result/
    ├── plain/Bed/Bed_0_pred.obj ...
    └── res/Bed/Bed_0_pred.obj ...

Run: python examples/part_sem_seg/visualize.py --dir_path result \
        --folders plain,res --category 4 --obj_no 0 --out compare.ply
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))  # repo root

# `visualize.py:11-13` category index table
category_names = [
    "Bag", "Bed", "Bottle", "Bowl", "Chair", "Clock", "Dishwasher", "Display",
    "Door", "Earphone", "Faucet", "Hat", "Keyboard", "Knife", "Lamp", "Laptop",
    "Microwave", "Mug", "Refrigerator", "Scissors", "StorageFurniture", "Table",
    "TrashCan", "Vase"]


def read_colored_obj(path: str):
    """Read 'v x y z r g b' lines (eval.py export format)."""
    pts, cols = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if len(t) >= 7 and t[0] == "v":
                pts.append([float(t[1]), float(t[2]), float(t[3])])
                cols.append([int(float(t[4])), int(float(t[5])), int(float(t[6]))])
    return np.asarray(pts, np.float32), np.asarray(cols, np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Qualitative comparison of models on PartNet segmentation")
    ap.add_argument("--category", type=int, default=4)
    ap.add_argument("--obj_no", type=int, default=0)
    ap.add_argument("--dir_path", type=str, default="../result")
    ap.add_argument("--folders", type=str, default="plain,res",
                    help='"," separated result folders, e.g. "res,plain"')
    ap.add_argument("--out", type=str, default="compare.ply")
    ap.add_argument("--spacing", type=float, default=2.5,
                    help="x offset between side-by-side clouds")
    args = ap.parse_args(argv)

    from deep_gcns_torch_tpu.utils.pc_export import write_ply

    category = category_names[args.category]
    folders = [x.strip() for x in args.folders.split(",")]
    pred_name = f"{category}_{args.obj_no}_pred.obj"
    gt_name = f"{category}_{args.obj_no}_gt.obj"

    # ground truth (from the first folder), then each model's prediction
    panels = [("ground_truth",
               osp.join(args.dir_path, folders[0], category, gt_name))]
    panels += [(f, osp.join(args.dir_path, f, category, pred_name))
               for f in folders]

    all_pts, all_cols = [], []
    for i, (name, path) in enumerate(panels):
        if not osp.exists(path):
            raise FileNotFoundError(f"missing {path} — run eval.py first")
        pts, cols = read_colored_obj(path)
        pts = pts.copy()
        pts[:, 0] += i * args.spacing
        all_pts.append(pts)
        all_cols.append(cols)
        print(f"panel {i}: {name} ({len(pts)} pts)")

    out = write_ply(args.out, np.concatenate(all_pts),
                    colors=np.concatenate(all_cols))
    print(f"wrote side-by-side comparison to {out} "
          f"(panels: ground truth, {', '.join(folders)})")
    return out


if __name__ == "__main__":
    main()
