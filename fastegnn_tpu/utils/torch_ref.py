"""Run the *actual* PyTorch reference models as parity oracles.

The reference (``/root/reference/models/*.py``) depends on torch_geometric /
torch_scatter / torch_sparse CUDA wheels that are not installed here.  Their
usage surface is tiny (SURVEY.md §2b):

- ``global_mean_pool`` (``models/FastEGNN.py:4``) — segment mean per graph;
- ``scatter_add`` / ``scatter_mean`` (``models/VNEGNN.py:6``,
  ``models/FastSchNet.py:15``);
- ``spmm`` (``models/basic.py:6``, EGHN pooling ``:668-673``);
- ``MessagePassing.propagate`` (``models/FastSchNet.py:590-623`` CFConv,
  ``models/GVP.py:222-286`` GVPConv);
- ``radius_graph`` (``models/FastSchNet.py:550``, unused when the caller
  passes ``edge_index``);
- ``SumAggregation`` / ``aggregation_resolver`` (``models/FastSchNet.py:391-392``).

This module provides pure-torch CPU shims for exactly that surface and an
importer that loads reference model files with the shims pre-installed in
``sys.modules`` — so parity tests (tests/test_torch_parity.py) execute the
reference's own code, not a transcription of it.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _require_torch():
    import torch  # noqa: F401

    return torch


def _build_shims():
    torch = _require_torch()

    # ---- torch_scatter ----
    def _broadcast(index, src, dim):
        if index.dim() == 1:
            for _ in range(dim):
                index = index.unsqueeze(0)
            while index.dim() < src.dim():
                index = index.unsqueeze(-1)
            index = index.expand_as(src)
        return index

    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        index = _broadcast(index, src, dim)
        if out is None:
            size = list(src.shape)
            size[dim] = int(index.max()) + 1 if dim_size is None else dim_size
            out = torch.zeros(size, dtype=src.dtype, device=src.device)
        return out.scatter_add_(dim, index, src)

    def scatter_mean(src, index, dim=0, out=None, dim_size=None):
        summed = scatter_add(src, index, dim=dim, dim_size=dim_size)
        ones = torch.ones_like(src)
        count = scatter_add(ones, index, dim=dim, dim_size=summed.shape[dim])
        count = count.clamp(min=1)
        result = summed / count
        if out is not None:
            out.copy_(result)
            return out
        return result

    torch_scatter = types.ModuleType("torch_scatter")
    torch_scatter.scatter_add = scatter_add
    torch_scatter.scatter_mean = scatter_mean

    # ---- torch_sparse.spmm ----
    def spmm(index, value, m, n, matrix):
        """Sparse [m, n] (COO ``index``, ``value``) @ dense ``matrix``.

        ``value`` is cast to the dense dtype — the reference passes integer
        ``torch.ones_like(row)`` values (``models/basic.py:668-673``), which
        real torch_sparse accepts."""
        sp = torch.sparse_coo_tensor(index, value.to(matrix.dtype), (m, n))
        return torch.sparse.mm(sp, matrix)

    torch_sparse = types.ModuleType("torch_sparse")
    torch_sparse.spmm = spmm

    # ---- torch_geometric.nn ----
    def global_mean_pool(x, batch, size=None):
        return scatter_mean(x, batch, dim=0, dim_size=size)

    def global_add_pool(x, batch, size=None):
        return scatter_add(x, batch, dim=0, dim_size=size)

    def radius_graph(pos, r, batch=None, loop=False, max_num_neighbors=32,
                     flow="source_to_target"):
        dist = torch.cdist(pos, pos)
        mask = dist <= r
        if batch is not None:
            mask &= batch[:, None] == batch[None, :]
        if not loop:
            mask.fill_diagonal_(False)
        row, col = mask.nonzero(as_tuple=True)
        # PyG returns edge_index [2, E] with flow source_to_target:
        # edge_index[0] = source (j / col), edge_index[1] = target (i / row)
        return torch.stack([col, row], dim=0)

    class SumAggregation(torch.nn.Module):
        def forward(self, x, index, ptr=None, dim_size=None, dim=0):
            return scatter_add(x, index, dim=dim, dim_size=dim_size)

    class MeanAggregation(torch.nn.Module):
        def forward(self, x, index, ptr=None, dim_size=None, dim=0):
            return scatter_mean(x, index, dim=dim, dim_size=dim_size)

    def aggregation_resolver(name, *args, **kwargs):
        if isinstance(name, torch.nn.Module):
            return name
        return {"sum": SumAggregation, "add": SumAggregation,
                "mean": MeanAggregation}[name]()

    class MessagePassing(torch.nn.Module):
        """Minimal ``propagate`` supporting the reference's message() usage.

        Convention (PyG flow="source_to_target"): for ``edge_index = [src,
        dst]``, ``x_j = x[src]`` (messages flow from j to i), ``x_i =
        x[dst]``, aggregation at ``dst``.
        """

        def __init__(self, aggr="add", node_dim=0, flow="source_to_target"):
            super().__init__()
            assert flow == "source_to_target"
            self.aggr = aggr

        def propagate(self, edge_index, size=None, **kwargs):
            import inspect

            src, dst = edge_index[0], edge_index[1]
            sig = inspect.signature(self.message)
            args = []
            for name in sig.parameters:
                if name.endswith("_i"):
                    args.append(kwargs[name[:-2]][dst])
                elif name.endswith("_j"):
                    args.append(kwargs[name[:-2]][src])
                else:
                    args.append(kwargs[name])
            msg = self.message(*args)
            if size is not None and size[1] is not None:
                dim_size = size[1]
            else:
                n = None
                for v in kwargs.values():
                    if torch.is_tensor(v) and v.dim() >= 1 and v.shape[0] != src.shape[0]:
                        n = v.shape[0]
                        break
                dim_size = n if n is not None else int(dst.max()) + 1
            if self.aggr == "add":
                return scatter_add(msg, dst, dim=0, dim_size=dim_size)
            if self.aggr == "mean":
                return scatter_mean(msg, dst, dim=0, dim_size=dim_size)
            raise NotImplementedError(self.aggr)

        def message(self, x_j):  # default PyG message
            return x_j

    # ---- SparseTensor (exactly the triplet-enumeration surface DimeNet
    # uses: constructor, row-select, set_value(None), sum(dim=1), storage
    # accessors — ``models/DimeNet.py:418-441``) ----
    class _Storage:
        def __init__(self, row, col, value):
            self._row, self._col, self._value = row, col, value

        def row(self):
            return self._row

        def col(self):
            return self._col

        def value(self):
            return self._value

    class SparseTensor:
        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            n_rows = int(sparse_sizes[0])
            perm = torch.argsort(row * int(sparse_sizes[1]) + col)
            self._row = row[perm]
            self._col = col[perm]
            self._value = None if value is None else value[perm]
            self._sizes = sparse_sizes
            counts = torch.bincount(self._row, minlength=n_rows)
            self._rowptr = torch.zeros(n_rows + 1, dtype=torch.long)
            self._rowptr[1:] = torch.cumsum(counts, 0)

        @classmethod
        def _from_storage(cls, row, col, value, sizes):
            out = cls.__new__(cls)
            out._row, out._col, out._value, out._sizes = row, col, value, sizes
            return out

        @property
        def storage(self):
            return _Storage(self._row, self._col, self._value)

        def __getitem__(self, idx):
            """Row-select: result rows are 0..len(idx)-1 in ``idx`` order."""
            counts = self._rowptr[idx + 1] - self._rowptr[idx]
            total = int(counts.sum())
            off = torch.arange(total) - torch.repeat_interleave(
                torch.cat([torch.zeros(1, dtype=torch.long),
                           torch.cumsum(counts, 0)[:-1]]), counts)
            pos = torch.repeat_interleave(self._rowptr[idx], counts) + off
            out_row = torch.repeat_interleave(
                torch.arange(idx.numel()), counts)
            val = None if self._value is None else self._value[pos]
            out = SparseTensor._from_storage(
                out_row, self._col[pos], val,
                (idx.numel(), self._sizes[1]))
            out._counts = counts
            return out

        def set_value(self, value, layout=None):
            out = SparseTensor._from_storage(
                self._row, self._col, value, self._sizes)
            if hasattr(self, "_counts"):
                out._counts = self._counts
            return out

        def sum(self, dim):
            assert dim == 1
            if hasattr(self, "_counts") and self._value is None:
                return self._counts
            v = (torch.ones_like(self._row, dtype=torch.float32)
                 if self._value is None else self._value)
            return scatter_add(v, self._row, dim=0,
                               dim_size=int(self._sizes[0]))

    torch_sparse.SparseTensor = SparseTensor

    # ---- torch_geometric.nn.inits / utils / resolvers ----
    def glorot_orthogonal(tensor, scale):
        """PyG init: orthogonal, rescaled to variance scale/(fan_in+fan_out)."""
        torch.nn.init.orthogonal_(tensor.data)
        tensor.data *= (scale / ((tensor.size(-2) + tensor.size(-1))
                                 * tensor.var())).sqrt()

    def activation_resolver(name="relu", *args, **kwargs):
        if callable(name) and not isinstance(name, str):
            return name
        return {"relu": torch.nn.ReLU(), "swish": torch.nn.SiLU(),
                "silu": torch.nn.SiLU()}[name]

    def pyg_scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        if reduce in ("sum", "add"):
            return scatter_add(src, index, dim=dim, dim_size=dim_size)
        if reduce == "mean":
            return scatter_mean(src, index, dim=dim, dim_size=dim_size)
        raise NotImplementedError(reduce)

    # dimenet_utils: back the sympy basis generators with OUR re-derived
    # forms (fastegnn_tpu/models/dimenet.py — Rayleigh j_l + brentq zeros,
    # validated against scipy in tests/test_dimenet.py); the reference
    # lambdifies expressions in symbols 'x' / 'theta', which sympy interns
    # by name, so these are drop-in.
    def bessel_basis(num_spherical, num_radial):
        from fastegnn_tpu.models.dimenet import _bessel_forms

        return _bessel_forms(num_spherical, num_radial)[0]

    def real_sph_harm(num_spherical, zero_m_only=True,
                      spherical_coordinates=True):
        assert zero_m_only, "shim supports the m=0 zonal harmonics only"
        from fastegnn_tpu.models.dimenet import _sph_harm_m0_forms

        return [[f] for f in _sph_harm_m0_forms(num_spherical)[0]]

    nn_mod = types.ModuleType("torch_geometric.nn")
    nn_mod.global_mean_pool = global_mean_pool
    nn_mod.global_add_pool = global_add_pool
    nn_mod.radius_graph = radius_graph
    nn_mod.MessagePassing = MessagePassing
    nn_mod.SumAggregation = SumAggregation
    nn_mod.MeanAggregation = MeanAggregation

    resolver_mod = types.ModuleType("torch_geometric.nn.resolver")
    resolver_mod.aggregation_resolver = aggregation_resolver
    resolver_mod.activation_resolver = activation_resolver
    nn_mod.resolver = resolver_mod

    inits_mod = types.ModuleType("torch_geometric.nn.inits")
    inits_mod.glorot_orthogonal = glorot_orthogonal
    nn_mod.inits = inits_mod

    models_mod = types.ModuleType("torch_geometric.nn.models")
    dimenet_utils_mod = types.ModuleType(
        "torch_geometric.nn.models.dimenet_utils")
    dimenet_utils_mod.bessel_basis = bessel_basis
    dimenet_utils_mod.real_sph_harm = real_sph_harm
    models_mod.dimenet_utils = dimenet_utils_mod
    nn_mod.models = models_mod

    utils_mod = types.ModuleType("torch_geometric.utils")
    utils_mod.scatter = pyg_scatter

    typing_mod = types.ModuleType("torch_geometric.typing")
    typing_mod.OptTensor = object  # typing alias only
    typing_mod.SparseTensor = SparseTensor

    # minimal Data record + pool submodule: enough for the reference
    # DATASET classes (datasets/simulation/dataset.py:11-12 imports Data and
    # radius_graph from torch_geometric.nn.pool)
    class Data:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def to(self, device):
            return self

        def __getitem__(self, key):
            # PyG Data supports dict access (reference
            # datasets/protein/dataset.py:64 reads data[0]['node_attr'])
            return self.__dict__[key]

        def __repr__(self):
            ks = ", ".join(sorted(self.__dict__))
            return f"ShimData({ks})"

    data_mod = types.ModuleType("torch_geometric.data")
    data_mod.Data = Data

    pool_mod = types.ModuleType("torch_geometric.nn.pool")
    pool_mod.radius_graph = radius_graph
    nn_mod.pool = pool_mod

    pyg = types.ModuleType("torch_geometric")
    pyg.nn = nn_mod
    pyg.typing = typing_mod
    pyg.utils = utils_mod
    pyg.data = data_mod

    return {
        "torch_scatter": torch_scatter,
        "torch_sparse": torch_sparse,
        "torch_geometric": pyg,
        "torch_geometric.nn": nn_mod,
        "torch_geometric.nn.resolver": resolver_mod,
        "torch_geometric.nn.inits": inits_mod,
        "torch_geometric.nn.models": models_mod,
        "torch_geometric.nn.models.dimenet_utils": dimenet_utils_mod,
        "torch_geometric.nn.pool": pool_mod,
        "torch_geometric.data": data_mod,
        "torch_geometric.utils": utils_mod,
        "torch_geometric.typing": typing_mod,
    }


def install_pyg_shims() -> None:
    """Install the fake torch_geometric/torch_scatter/torch_sparse modules.

    No-op for any that are already importable (real wheels win).
    """
    shims = _build_shims()
    for name, mod in shims.items():
        if name not in sys.modules:
            sys.modules[name] = mod


def load_reference_module(relpath: str, module_name: str | None = None):
    """Import a reference source file (e.g. ``models/FastEGNN.py``) with shims.

    Returns the loaded module; raises FileNotFoundError if the reference tree
    is absent (tests skip in that case).
    """
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        raise FileNotFoundError(path)
    install_pyg_shims()
    name = module_name or f"_ref_{relpath.replace('/', '_').removesuffix('.py')}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
