"""Pure-torch shims of torch_scatter / torch_cluster / torch_geometric —
just enough surface to EXECUTE the reference's own modules
(`/root/reference/gcn_lib/sparse/*`, `eff_gcn_modules/rev/*`) on CPU torch,
so golden files come from the reference code itself rather than from
builder-authored numpy re-derivations (VERDICT r4 next #4).

What is shim vs reference:
  * the reference's OWN math (GenMessagePassing aggregate quirks, GENConv
    forward, MRConv, the SAGEConv message/update overrides, MLP/norm
    factories, the reversible engine memgcn/gcn_revop) runs VERBATIM from
    /root/reference;
  * these shims re-supply the third-party plumbing it imports: scatter ops
    (torch_scatter 1.x call signatures + the fill/empty-segment semantics
    `utils/pyg_util.py:30-34` relies on), a PyG-1.x MessagePassing base
    (suffix-dispatched propagate), and the PyG-1.x conv internals the
    reference subclasses (GGATConv/GCNConv/SAGEConv/GINConv/EdgeConv param
    layout + message flow).  For the subclassed convs the *internals* are
    shim-authored from the published PyG-1.x semantics — goldens through them
    are reference-composition over shim-primitive; GENConv/MRConv/rev goldens
    are reference end-to-end.

Usage: call install() BEFORE importing anything from /root/reference; it
registers the fake modules in sys.modules and prepends /root/reference to
sys.path.
"""

import inspect
import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

REF = "/root/reference"


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def _broadcast(index, src, dim):
    if index.dim() == 1:
        shape = [1] * src.dim()
        shape[dim] = -1
        index = index.view(shape)
    return index.expand_as(src)


def _scatter_reduce(src, index, dim, dim_size, reduce, fill):
    size = list(src.shape)
    size[dim] = int(dim_size if dim_size is not None
                    else (int(index.max()) + 1 if index.numel() else 0))
    out = src.new_full(size, fill)
    out = out.scatter_reduce(dim, _broadcast(index, src, dim), src,
                             reduce=reduce, include_self=(fill != 0)
                             or reduce in ("sum", "prod"))
    return out


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    assert out is None
    return _scatter_reduce(src, index, dim, dim_size, "sum", 0.0)


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    assert out is None
    s = scatter_add(src, index, dim, None, dim_size)
    ones = torch.ones(index.shape, dtype=src.dtype)
    cnt = scatter_add(ones, index, 0, None, s.shape[dim])
    shape = [1] * s.dim()
    shape[dim] = -1
    return s / cnt.clamp(min=1).view(shape)


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    assert out is None
    fill = torch.finfo(src.dtype).min
    # clone: utils/pyg_util.py zeroes the fill positions IN PLACE; the clone
    # keeps the autograd-saved reduce output version-stable (grads at zeroed
    # positions correctly vanish through index_put_)
    o = _scatter_reduce(src, index, dim, dim_size, "amax", fill).clone()
    return o, None  # argmax not used by the reference paths we run


def scatter_min(src, index, dim=0, out=None, dim_size=None):
    assert out is None
    fill = torch.finfo(src.dtype).max
    o = _scatter_reduce(src, index, dim, dim_size, "amin", fill).clone()
    return o, None


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    assert out is None
    if reduce in ("sum", "add"):
        return scatter_add(src, index, dim, None, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, None, dim_size)
    if reduce == "max":
        return scatter_max(src, index, dim, None, dim_size)[0]
    if reduce == "min":
        return scatter_min(src, index, dim, None, dim_size)[0]
    raise NotImplementedError(reduce)


def scatter_softmax(src, index, dim=0):
    mx = _scatter_reduce(src.detach(), index, dim, None, "amax",
                         torch.finfo(src.dtype).min)
    e = torch.exp(src - mx.index_select(dim, index if index.dim() == 1
                                        else index))
    den = scatter_add(e, index, dim)
    return e / den.index_select(dim, index).clamp(min=1e-16)


# ---------------------------------------------------------------------------
# torch_geometric.utils
# ---------------------------------------------------------------------------

def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    return edge_index, edge_attr


def add_self_loops(edge_index, edge_weight=None, fill_value=1.0,
                   num_nodes=None):
    n = int(num_nodes if num_nodes is not None else edge_index.max() + 1)
    loop = torch.arange(n, dtype=edge_index.dtype)
    edge_index = torch.cat([edge_index, torch.stack([loop, loop])], dim=1)
    if edge_weight is not None:
        edge_weight = torch.cat(
            [edge_weight, edge_weight.new_full((n,), fill_value)])
        return edge_index, edge_weight
    return edge_index, None


def degree(index, num_nodes=None, dtype=None):
    n = int(num_nodes if num_nodes is not None else index.max() + 1)
    out = torch.zeros(n, dtype=dtype or torch.float32)
    return out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))


def pyg_softmax(src, index, num_nodes=None):
    """PyG-1.x `torch_geometric.utils.softmax` (per-target softmax)."""
    n = int(num_nodes if num_nodes is not None else index.max() + 1)
    mx = _scatter_reduce(src.detach(), index, 0, n, "amax",
                         torch.finfo(src.dtype).min)
    e = torch.exp(src - mx.index_select(0, index))
    den = scatter_add(e, index, 0, None, n)
    return e / den.index_select(0, index).clamp(min=1e-16)


# ---------------------------------------------------------------------------
# PyG-1.x MessagePassing base (suffix-dispatched propagate)
# ---------------------------------------------------------------------------

class MessagePassing(nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=0,
                 **kwargs):
        super().__init__()
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    def propagate(self, edge_index, size=None, **kwargs):
        j, i = (0, 1) if self.flow == "source_to_target" else (1, 0)
        idx_j, idx_i = edge_index[j], edge_index[i]
        x = kwargs.get("x")
        dim_size = (x.size(self.node_dim) if x is not None
                    else int(edge_index.max()) + 1)
        if isinstance(size, (list, tuple)) and size[i] is not None:
            dim_size = size[i]

        def collect(fn, skip_first=False):
            out = {}
            names = list(inspect.signature(fn).parameters)
            if skip_first:
                names = names[1:]
            for name in names:
                if name == "edge_index_i":
                    out[name] = idx_i
                elif name == "edge_index_j":
                    out[name] = idx_j
                elif name == "size_i":
                    out[name] = dim_size
                elif name.endswith("_j") and name[:-2] in kwargs and \
                        kwargs[name[:-2]] is not None:
                    out[name] = kwargs[name[:-2]].index_select(
                        self.node_dim, idx_j)
                elif name.endswith("_i") and name[:-2] in kwargs and \
                        kwargs[name[:-2]] is not None:
                    out[name] = kwargs[name[:-2]].index_select(
                        self.node_dim, idx_i)
                elif name in kwargs:
                    out[name] = kwargs[name]
            return out

        msg = self.message(**collect(self.message))
        agg = self.aggregate(msg, idx_i, None, dim_size)
        return self.update(agg, **collect(self.update, skip_first=True))

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        return scatter(inputs, index, dim=self.node_dim, dim_size=dim_size,
                       reduce="sum" if self.aggr == "add" else self.aggr)

    def update(self, aggr_out):
        return aggr_out


def _glorot(t):
    if t is not None:
        stdv = math.sqrt(6.0 / (t.size(-2) + t.size(-1)))
        t.data.uniform_(-stdv, stdv)


def _zeros(t):
    if t is not None:
        t.data.fill_(0)


def _uniform(size, t):
    if t is not None:
        bound = 1.0 / math.sqrt(size)
        t.data.uniform_(-bound, bound)


class EdgeConv(MessagePassing):
    """PyG-1.x EdgeConv: nn(cat[x_i, x_j - x_i]), default max aggregation."""

    def __init__(self, nn_module, aggr="max", **kwargs):
        super().__init__(aggr=aggr, **kwargs)
        self.nn = nn_module

    def forward(self, x, edge_index):
        return self.propagate(edge_index, x=x)

    def message(self, x_i, x_j):
        return self.nn(torch.cat([x_i, x_j - x_i], dim=-1))


class GATConv(MessagePassing):
    """PyG-1.x GATConv: weight [in, H*D], att [1, H, 2D], one self loop."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, dropout=0.0, bias=True,
                 add_self_loops=True, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.heads = heads
        self.out_channels = out_channels
        self.concat = concat
        self.negative_slope = negative_slope
        self.dropout = dropout
        self.add_self_loops_flag = add_self_loops
        self.weight = nn.Parameter(
            torch.empty(in_channels, heads * out_channels))
        self.att = nn.Parameter(torch.empty(1, heads, 2 * out_channels))
        if bias and concat:
            self.bias = nn.Parameter(torch.zeros(heads * out_channels))
        elif bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.bias = None
        _glorot(self.weight)
        _glorot(self.att)

    def forward(self, x, edge_index, size=None):
        if self.add_self_loops_flag:
            edge_index, _ = remove_self_loops(edge_index)
            edge_index, _ = add_self_loops(edge_index,
                                           num_nodes=x.size(self.node_dim))
        x = torch.matmul(x, self.weight)
        return self.propagate(edge_index, size=size, x=x)

    def message(self, edge_index_i, x_i, x_j, size_i):
        x_j = x_j.view(-1, self.heads, self.out_channels)
        x_i = x_i.view(-1, self.heads, self.out_channels)
        alpha = (torch.cat([x_i, x_j], dim=-1) * self.att).sum(dim=-1)
        alpha = F.leaky_relu(alpha, self.negative_slope)
        alpha = pyg_softmax(alpha, edge_index_i, size_i)
        if self.training and self.dropout > 0:
            alpha = F.dropout(alpha, p=self.dropout, training=True)
        return x_j * alpha.view(-1, self.heads, 1)

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        out = scatter_add(inputs.reshape(inputs.size(0), -1), index, 0, None,
                          dim_size)
        return out

    def update(self, aggr_out):
        if not self.concat:
            aggr_out = aggr_out.view(-1, self.heads,
                                     self.out_channels).mean(dim=1)
        if self.bias is not None:
            aggr_out = aggr_out + self.bias
        return aggr_out


class GCNConv(MessagePassing):
    """PyG-1.x GCNConv: self loops (fill 1) + symmetric deg^-1/2 norm."""

    def __init__(self, in_channels, out_channels, improved=False,
                 cached=False, bias=True, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.weight = nn.Parameter(torch.empty(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        _glorot(self.weight)

    def forward(self, x, edge_index, edge_weight=None):
        n = x.size(self.node_dim)
        if edge_weight is None:
            edge_weight = torch.ones(edge_index.size(1), dtype=x.dtype)
        edge_index, edge_weight = add_self_loops(edge_index, edge_weight,
                                                 1.0, n)
        row, col = edge_index[0], edge_index[1]
        deg = scatter_add(edge_weight, col, 0, None, n)
        dis = deg.pow(-0.5)
        dis[dis == float("inf")] = 0
        norm = dis[row] * edge_weight * dis[col]
        x = torch.matmul(x, self.weight)
        return self.propagate(edge_index, x=x, norm=norm)

    def message(self, x_j, norm):
        return norm.view(-1, 1) * x_j

    def update(self, aggr_out):
        if self.bias is not None:
            aggr_out = aggr_out + self.bias
        return aggr_out


class SAGEConv(MessagePassing):
    """PyG-1.x SAGEConv param layout (weight [in, out] + bias), mean aggr.
    The reference subclasses this and overrides forward/message/update
    (`gcn_lib/sparse/torch_vertex.py:136-197`), so only the parameters and
    the propagate plumbing come from the shim."""

    def __init__(self, in_channels, out_channels, normalize=False, bias=True,
                 **kwargs):
        super().__init__(aggr="mean", **kwargs)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.normalize = normalize
        self.weight = nn.Parameter(torch.empty(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        _uniform(in_channels, self.weight)


class GINConv(MessagePassing):
    """PyG-1.x GINConv: nn((1 + eps) x + sum_j x_j)."""

    def __init__(self, nn_module, eps=0.0, train_eps=False, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.nn = nn_module
        self.initial_eps = eps
        self.eps = torch.nn.Parameter(torch.tensor([eps])) if train_eps \
            else torch.tensor([eps])

    def forward(self, x, edge_index):
        out = self.propagate(edge_index, x=x)
        return self.nn((1 + self.eps) * x + out)

    def message(self, x_j):
        return x_j


# ---------------------------------------------------------------------------
# torch_cluster.knn_graph
# ---------------------------------------------------------------------------

def knn_graph(x, k, batch=None, loop=False, flow="source_to_target"):
    d = torch.cdist(x, x)
    if batch is not None:
        mask = batch.view(-1, 1) != batch.view(1, -1)
        d = d.masked_fill(mask, float("inf"))
    if not loop:
        d.fill_diagonal_(float("inf"))
    idx = d.topk(k, largest=False).indices            # [N, k] neighbors
    centers = torch.arange(x.size(0)).view(-1, 1).expand_as(idx)
    if flow == "source_to_target":
        return torch.stack([idx.reshape(-1), centers.reshape(-1)])
    return torch.stack([centers.reshape(-1), idx.reshape(-1)])


# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

def install():
    """Register the shims in sys.modules and put /root/reference on sys.path.
    Idempotent; call before importing gcn_lib / eff_gcn_modules / utils."""
    if "torch_scatter" in sys.modules and \
            getattr(sys.modules["torch_scatter"], "_is_shim", False):
        return

    ts = types.ModuleType("torch_scatter")
    ts._is_shim = True
    for fn in (scatter, scatter_add, scatter_mean, scatter_max, scatter_min,
               scatter_softmax):
        setattr(ts, fn.__name__, fn)
    sys.modules["torch_scatter"] = ts

    tc = types.ModuleType("torch_cluster")
    tc.knn_graph = knn_graph
    sys.modules["torch_cluster"] = tc

    tg = types.ModuleType("torch_geometric")
    tgnn = types.ModuleType("torch_geometric.nn")
    for cls in (MessagePassing, EdgeConv, GATConv, GCNConv, SAGEConv,
                GINConv):
        setattr(tgnn, cls.__name__, cls)
    tgu = types.ModuleType("torch_geometric.utils")
    tgu.remove_self_loops = remove_self_loops
    tgu.add_self_loops = add_self_loops
    tgu.degree = degree
    tgu.softmax = pyg_softmax
    tgd = types.ModuleType("torch_geometric.data")

    class Data:  # noqa: D401 — placeholder for utils.data_util import
        pass

    class InMemoryDataset:
        pass

    tgd.Data = Data
    tgd.InMemoryDataset = InMemoryDataset
    tgd.extract_zip = lambda *a, **k: None
    tg.nn = tgnn
    tg.utils = tgu
    tg.data = tgd
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tgnn
    sys.modules["torch_geometric.utils"] = tgu
    sys.modules["torch_geometric.data"] = tgd

    for name in ("h5py", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda it, *a, **k: it
            sys.modules[name] = mod

    if REF not in sys.path:
        sys.path.insert(0, REF)
