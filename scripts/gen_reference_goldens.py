"""Regenerate golden files by EXECUTING THE REFERENCE'S OWN CODE on CPU torch
through the pure-torch shims (tests/torch_shims.py) — VERDICT r4 next #4:
the previous goldens were builder-authored numpy re-derivations
(tests/np_ref_models.py), a shared-misunderstanding risk; these come from
`/root/reference/gcn_lib/sparse/*`, `eff_gcn_modules/rev/*` and
`examples/ogb/ogbn_arxiv/model.py` verbatim.

Each case saves to tests/goldens/ref_<case>.npz:
  sd.<name>   every reference parameter/buffer (state_dict)
  gd.<name>   its gradient under loss = sum(out * co)
  x, edge_index, [edge_attr], co, out, gx

Run: python scripts/gen_reference_goldens.py   (CPU-only, ~30 s)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import torch_shims  # noqa: E402

torch_shims.install()

import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
N, E, C = 96, 400, 16


def graph(rng, n=N, e=E, no_self=False):
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    if no_self:
        keep = s != r
        s, r = s[keep], r[keep]
    # every node receives >= 1 edge (sidesteps empty-segment fill ambiguity
    # in max-aggregations; the empty case is covered by our own scatter tests)
    s = np.concatenate([s, rng.integers(0, n, n)])
    r = np.concatenate([r, np.arange(n)])
    if no_self:
        s[-n:] = (r[-n:] + 1) % n
    return np.stack([s, r])


def run_case(name, module, inputs, x, co, extra_tensors=None):
    module.train()
    xt = torch.tensor(x, requires_grad=True)
    out = module(xt, *inputs)
    loss = (out * torch.tensor(co)).sum()
    loss.backward()
    rec = {"x": x, "co": co, "out": out.detach().numpy(),
           "gx": xt.grad.numpy()}
    for k, v in (extra_tensors or {}).items():
        rec[k] = v
    for pname, p in module.state_dict().items():
        rec["sd." + pname] = p.detach().numpy()
    for pname, p in module.named_parameters():
        rec["gd." + pname] = (p.grad.detach().numpy() if p.grad is not None
                              else np.zeros(p.shape, np.float32))
    path = os.path.join(OUT, f"ref_{name}.npz")
    np.savez(path, **rec)
    print(f"[golden] {name}: out_mean={np.abs(rec['out']).mean():.4f} "
          f"({len(rec)} arrays) -> {path}")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)
    torch.manual_seed(0)

    from gcn_lib.sparse.torch_vertex import (EdgConv, GATConv, GENConv,
                                             GinConv, MRConv, RSAGEConv,
                                             SemiGCNConv)

    ei_np = graph(rng)
    ei = torch.tensor(ei_np)
    x = rng.standard_normal((N, C)).astype(np.float32)

    # --- GENConv: all 8 aggregators, learnable t/p/y, 2-layer MLP w/ BN ----
    for aggr in ("softmax", "softmax_sg", "softmax_sum", "power", "power_sum",
                 "add", "mean", "max"):
        torch.manual_seed(1)
        conv = GENConv(C, C, aggr=aggr, learn_t=True, learn_p=True,
                       learn_y=True, norm="batch", mlp_layers=2)
        co = rng.standard_normal((N, C)).astype(np.float32)
        run_case(f"genconv_{aggr}", conv, (ei,), x, co,
                 {"edge_index": ei_np})

    # --- GENConv with edge encodings + MsgNorm ------------------------------
    torch.manual_seed(2)
    ea = rng.standard_normal((ei_np.shape[1], 8)).astype(np.float32)
    conv = GENConv(C, C, aggr="softmax", learn_t=True, msg_norm=True,
                   learn_msg_scale=True, encode_edge=True, edge_feat_dim=8,
                   norm="batch", mlp_layers=2)
    co = rng.standard_normal((N, C)).astype(np.float32)
    run_case("genconv_softmax_edge", conv, (ei, torch.tensor(ea)), x, co,
             {"edge_index": ei_np, "edge_attr": ea})

    # --- MRConv (scatter_ 'max' semantics) ----------------------------------
    torch.manual_seed(3)
    co = rng.standard_normal((N, C)).astype(np.float32)
    run_case("mrconv", MRConv(C, C), (ei,), x, co, {"edge_index": ei_np})

    # --- RSAGEConv both flavors (self-loop handling inside reference fwd) ---
    ei_ns_np = graph(rng, no_self=True)
    ei_ns = torch.tensor(ei_ns_np)
    for rel in (False, True):
        torch.manual_seed(4 + rel)
        co = rng.standard_normal((N, C)).astype(np.float32)
        run_case(f"rsage{'_rel' if rel else ''}",
                 RSAGEConv(C, C, relative=rel), (ei_ns,), x, co,
                 {"edge_index": ei_ns_np})

    # --- reference-composition-over-shim convs ------------------------------
    for name, conv in (("semigcn", SemiGCNConv(C, C)),
                       ("gin", GinConv(C, C)),
                       ("edge", EdgConv(C, C)),
                       ("gat", GATConv(C, C // 4, heads=4))):
        torch.manual_seed(hash(name) % 1000)
        co = rng.standard_normal((N, C)).astype(np.float32)
        run_case(name, conv, (ei_ns,), x, co, {"edge_index": ei_ns_np})

    # --- 2-layer DeeperGCN (res+ softmax) from the arxiv example ------------
    sys.path.insert(0, os.path.join(torch_shims.REF, "examples", "ogb",
                                    "ogbn_arxiv"))
    from types import SimpleNamespace

    from model import DeeperGCN  # noqa: E402  (reference example model)

    args = SimpleNamespace(
        num_layers=2, dropout=0.0, block="res+", in_channels=C,
        hidden_channels=24, num_tasks=5, conv="gen", gcn_aggr="softmax",
        t=1.0, learn_t=True, p=1.0, learn_p=False, y=0.0, learn_y=False,
        msg_norm=False, learn_msg_scale=False, norm="batch", mlp_layers=1)
    torch.manual_seed(7)
    model = DeeperGCN(args)
    co = rng.standard_normal((N, 5)).astype(np.float32)
    run_case("deepergcn2", model, (ei,), x, co, {"edge_index": ei_np})

    # --- reversible engine: memgcn coupling + gcn_revop invertible bwd ------
    from eff_gcn_modules.rev.gcn_revop import InvertibleModuleWrapper
    from eff_gcn_modules.rev.memgcn import GroupAdditiveCoupling
    from eff_gcn_modules.rev.rev_layer import GENBlock

    torch.manual_seed(8)
    CH = 32
    Fms = torch.nn.ModuleList(
        [GENBlock(CH // 2, CH // 2, aggr="softmax", learn_t=True,
                  norm="layer") for _ in range(2)])
    inv = InvertibleModuleWrapper(
        GroupAdditiveCoupling(Fms, group=2), preserve_rng_state=False)

    class Rev(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.inv = inv

        def forward(self, x, edge_index):
            # memgcn chunks *args per group (a mask arg is required even in
            # eval, where SharedDropout is identity)
            mask = torch.ones_like(x)
            return self.inv(x, edge_index, mask)

    xr = rng.standard_normal((N, CH)).astype(np.float32)
    co = rng.standard_normal((N, CH)).astype(np.float32)
    m = Rev()
    m.eval()  # SharedDropout identity; invertible bwd still reconstructs
    xt = torch.tensor(xr, requires_grad=True)
    out = m(xt, ei)
    # snapshot BEFORE backward: InvertibleCheckpointFunction frees the output
    # storage once it has reconstructed the input (gcn_revop.py:100 region)
    out_np = out.detach().clone().numpy()
    (out * torch.tensor(co)).sum().backward()
    rec = {"x": xr, "co": co, "out": out_np,
           "gx": xt.grad.numpy(), "edge_index": ei_np}
    for pname, p in m.state_dict().items():
        rec["sd." + pname] = p.detach().numpy()
    for pname, p in m.named_parameters():
        rec["gd." + pname] = p.grad.detach().numpy()
    np.savez(os.path.join(OUT, "ref_rev_coupling.npz"), **rec)
    print(f"[golden] rev_coupling: out_mean={np.abs(rec['out']).mean():.4f}")


if __name__ == "__main__":
    main()
