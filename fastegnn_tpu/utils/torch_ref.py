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

    nn_mod = types.ModuleType("torch_geometric.nn")
    nn_mod.global_mean_pool = global_mean_pool
    nn_mod.global_add_pool = global_add_pool
    nn_mod.radius_graph = radius_graph
    nn_mod.MessagePassing = MessagePassing
    nn_mod.SumAggregation = SumAggregation
    nn_mod.MeanAggregation = MeanAggregation

    resolver_mod = types.ModuleType("torch_geometric.nn.resolver")
    resolver_mod.aggregation_resolver = aggregation_resolver
    nn_mod.resolver = resolver_mod

    typing_mod = types.ModuleType("torch_geometric.typing")
    typing_mod.OptTensor = object  # typing alias only

    pyg = types.ModuleType("torch_geometric")
    pyg.nn = nn_mod
    pyg.typing = typing_mod

    return {
        "torch_scatter": torch_scatter,
        "torch_sparse": torch_sparse,
        "torch_geometric": pyg,
        "torch_geometric.nn": nn_mod,
        "torch_geometric.nn.resolver": resolver_mod,
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
