"""Fused FastEGNN edge block v5 — feature-major Pallas kernels.

Computes the reference's real<->real edge block (``models/FastEGNN.py``
lines 102-133 and 180-189 of GLAD-RUC/FastEGNN):

    m_e    = silu(silu([h_dst, h_src, |x_dst-x_src|^2, e_attr] W1 + b1) W2 + b2)
    gate_e = silu(m_e Wg1 + bg1) wg2
    msum_n = sum_{e: dst=n} m_e        tsum_n = sum_{e: dst=n} diff_e*gate_e

Fifth redesign; the fourth (scripts/v4_lab.py) measured ~3.3 ns/slot
INVARIANT to chunk size, window width, grid factor and padding — the
slot-major chain's narrow intermediates ([E,1] radial/gate, [E,3] diff)
each burn full 128-lane vregs, so the kernel was VPU-traffic-bound, not
MXU- or overhead-bound.  v5 therefore computes the whole chain
**feature-major** ([64, chunk]: features on sublanes, edge slots on
lanes), which makes every per-edge scalar a [1, chunk] row and cuts the
elementwise traffic ~4x (measured: 1.9 vs 5.5 ms/layer fwd+bwd at the
bench geometry).

Design:

- **Pre-folded node table** (built by XLA, [Npad, 256] cd): dst-role cols
  0:128 = [Ud | x_hi | 0_5 | x_lo | 0_5 | 0_48], src-role cols 128:256 =
  [Us | -x_hi | ... ] where Ud = h W1_dst + b1, Us = h W1_src.  The
  gather dots then fold gather AND the first linear in one MXU pass, and
  per-chunk table views are pure 128-lane dynamic slices (no concats —
  the v3 kernel's [K, chunk] operand concatenations were its largest
  hidden cost).  x rides as an exact bf16 hi+lo split at 8-row-aligned
  offsets so feature-major rows slice on sublane-tile boundaries.
- **Contiguous source windows**: the host packer (:func:`make_v5_meta`)
  sorts edges by (dst_block, src_block) and packs chunks whose source
  blocks lie in ONE range [w0, w0+W) — the window slice is a single
  dynamic sublane slice.
- **Same-dst-block superchunks**: each grid step's G chunks share one
  destination block, so the step's output block (fwd) and upstream-grad
  block (bwd) STREAM via scalar-prefetch index maps — consecutive
  same-index steps keep the block in VMEM (classic revisit/reduction
  pattern) — and only the src-role grad accumulator stays whole in VMEM.
  This bounds bwd VMEM at ~10 MB (16 MB/core budget).
- **Epilogue weight grads**: the backward scatters raw d_z1 sums per node
  (dst role and src role); dh, dW1 and db1 then come from three [N,64]
  XLA matmuls OUTSIDE the kernel — the chunk loop carries no weight-grad
  dots for the gather layer.

Precision: MLP path in ``compute_dtype`` (bf16 production; f32 exact with
"highest" matmul precision for CPU-interpret tests), f32 accumulation
everywhere, coordinates exact via hi/lo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_MAX = 64
ROWS = 128
EA_ROWS = 3


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _silu_f32(z):
    # The sigmoid itself always runs in f32: Mosaic's logistic lowering
    # broadcasts an f32 scalar into the result vector, which fails to
    # verify when z is bf16 (vector.broadcast f32 -> bf16).  Storage of
    # the returned s/activation stays in z.dtype, so the bf16 chain keeps
    # its VPU-traffic savings; for f32 inputs this is a bit-exact no-op.
    #
    # bf16 path: sigmoid(x) = 0.5*(1 + tanh(x/2)) — Mosaic lowers tanh to a
    # single hardware transcendental while the logistic goes through
    # exp + divide; measured ~20% off the whole fwd kernel at the bench
    # geometry (scripts/r3_klab.py "tanhsig").  The two forms differ by
    # ~1 ulp f32, far below bf16 storage rounding.  f32 inputs keep the
    # exact logistic (bit-exact vs the XLA composition for parity tests).
    zf = z.astype(jnp.float32)
    if z.dtype == jnp.bfloat16:
        s = 0.5 + 0.5 * jnp.tanh(0.5 * zf)
    else:
        s = jax.nn.sigmoid(zf)
    s = s.astype(z.dtype)
    return z * s, s


def _dsilu(z, s):
    return s * (1.0 + z * (1.0 - s))


def _hi_lo(v, cd):
    """Split an f32 value into (hi, lo) in compute dtype; exact when cd is
    f32 (lo = 0) and a 2^-16-relative split when cd is bf16."""
    hi = v.astype(cd)
    lo = (v - hi.astype(jnp.float32)).astype(cd)
    return hi, lo


@struct.dataclass
class EdgeKernelV5Meta:
    """Host-precomputed feature-major slot layout (see module docstring)."""

    idsx: jax.Array      # [4, n_slots] i32.  Row 0 packs both one-hot ids:
                         #  id = (dl + 1) * 512 + gl where dl = dst row
                         #  relative to the chunk's dw0 and gl = window gid
                         #  (sb - w0) * 128 + src-local; sentinel slots are
                         #  -1 (decoding to dl = -2, gl = 511: match nothing
                         #  for any D <= 128, W <= 3).  Rows 1:1+fe carry
                         #  edge-attr f32 bits, rest 0.  Half the stream
                         #  bytes of the round-4 [8, n_slots] layout.
    w0: jax.Array        # [n_chunks] i32 window base src block
    dw0: jax.Array       # [n_chunks] i32 dst-window base row (8-aligned,
                         #  within the superchunk's S*128-row dst superblock)
    sdb: jax.Array       # [n_super] i32 dst SUPERBLOCK of each superchunk
    chunk: int = struct.field(pytree_node=False, default=256)
    W: int = struct.field(pytree_node=False, default=2)
    G: int = struct.field(pytree_node=False, default=8)
    D: int = struct.field(pytree_node=False, default=128)
    # S = dst-superblock factor: the streamed output / upstream-grad block
    # covers S*128 node rows.  Larger S costs nothing per slot (the dst
    # one-hot stays [D, chunk]); it cuts the per-block round-up-to-G padding
    # by ~S and lets chunks span 128-row block boundaries.
    S: int = struct.field(pytree_node=False, default=1)
    n_slots: int = struct.field(pytree_node=False, default=0)
    n_chunks: int = struct.field(pytree_node=False, default=0)
    n_super: int = struct.field(pytree_node=False, default=0)
    n_blocks: int = struct.field(pytree_node=False, default=0)
    eattr_fe: int = struct.field(pytree_node=False, default=2)
    # packed graph-group layouts: this meta's arrays may be slices of ONE
    # concatenated (idsx, w0, dw0, sdb) quadruple shared by all groups of a
    # batch (4 transferred leaves instead of 4 per group); super_off is the
    # group's first superchunk within the packed arrays
    super_off: int = struct.field(pytree_node=False, default=0)


def _pack_idsx(idsx8: np.ndarray) -> np.ndarray:
    """[8, n] legacy slot rows -> [4, n]: ids packed (dl+1)*512 + gl into
    row 0 (sentinel -1), edge-attr bit rows 2:5 moved to 1:4."""
    dl, gl = idsx8[0], idsx8[1]
    out = np.empty((4, idsx8.shape[1]), np.int32)
    out[0] = np.where(dl < 0, -1, (dl + 1) * 512 + gl)
    out[1:4] = idsx8[2:5]
    return out


def make_v5_meta(
    dst: np.ndarray,
    src: np.ndarray,
    edge_attr: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    chunk: int = 256,
    W: int = 2,
    G: int = 8,
    D: int = 128,
    S: int = 1,
    as_numpy: bool = False,
) -> EdgeKernelV5Meta:
    """Pack edges into contiguous-window chunks grouped into same-dst-
    superblock superchunks.  ``as_numpy`` keeps the meta arrays as host
    numpy (graph-group packing concatenates many metas before ONE device
    transfer; per-group jnp round-trips cost seconds per production batch).

    Edges are sorted by (dst_superblock, src_block, dst); per dst superblock
    (``S`` 128-row blocks), chunks accept tiles while their src block stays
    within [w0, w0+W) AND their dst row stays within [dw0, dw0+D) of the
    superblock (``D`` < 128 shrinks the dst one-hot and scatter dots ~4x at
    the cost of padding — D=128 disables the constraint).  Each superblock's
    chunk run is padded to a multiple of G with sentinel chunks, and every
    superblock emits at least one (possibly empty) superchunk so its
    streamed output block is always written.  ``S`` > 1 shrinks that
    round-up padding ~S-fold at zero per-slot cost.
    """
    dst = np.asarray(dst)
    src = np.asarray(src)
    edge_attr = np.asarray(edge_attr, np.float32)
    fe = edge_attr.shape[1]
    assert fe <= 3, f"edge_attr dim {fe} exceeds v5 packing capacity"
    assert D % 8 == 0 and 8 <= D <= 128
    assert S >= 1
    srows = S * ROWS
    n_blocks_ = _round_up(num_nodes, ROWS) // ROWS

    # native C++ packer (same algorithm; ~50x faster at Water-3D scale —
    # the python path below is the tested fallback)
    from fastegnn_tpu import native

    packed = native.pack_v5_native(
        dst, src, edge_attr, edge_mask, num_nodes, chunk, W, G, D, S)
    if packed is not None:
        idsx_n, w0_n, dw0_n, sdb_n = packed
        n_chunks_ = w0_n.shape[0]
        # the kernel promises Mosaic 8-alignment of sdb*S*ROWS + dw0 slices
        # (pl.multiple_of below); a packer regression must fail loudly here
        # rather than silently corrupt dst-window slices on hardware
        assert (np.asarray(dw0_n) % 8 == 0).all(), "v5 packer: dw0 not 8-aligned"
        conv = (lambda x: x) if as_numpy else jnp.asarray
        return EdgeKernelV5Meta(
            idsx=conv(_pack_idsx(np.asarray(idsx_n))),
            w0=conv(w0_n),
            dw0=conv(dw0_n), sdb=conv(sdb_n),
            chunk=chunk, W=W, G=G, D=D, S=S,
            n_slots=n_chunks_ * chunk, n_chunks=n_chunks_,
            n_super=n_chunks_ // G, n_blocks=n_blocks_, eattr_fe=fe)

    real = np.asarray(edge_mask) & (dst < num_nodes)
    eidx = np.nonzero(real)[0]
    dst_r, src_r = dst[eidx], src[eidx]
    db, sb = dst_r // srows, src_r // ROWS
    order = np.lexsort((dst_r % srows, sb, db))  # dst ascending within tile
    eidx, dst_r, src_r, db, sb = (
        eidx[order], dst_r[order], src_r[order], db[order], sb[order])

    n_blocks = n_blocks_
    n_sblocks = _round_up(num_nodes, srows) // srows
    key = db.astype(np.int64) * n_blocks + sb
    tb = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1, [key.size]])
    max_w0 = max(n_blocks - W, 0)
    dloc_all = (dst_r % srows).astype(np.int32)

    # chunk assembly works on (pos, take, woff) RUNS, not per-edge python
    # items — the tile loop is O(#tiles + #chunks), edges are materialized
    # at the end with numpy slicing
    per_db = {b: [] for b in range(n_sblocks)}  # b -> [(w0, dw0, runs, n)]
    cur = None                                  # [db, w0, dw0, runs, n]

    def close():
        nonlocal cur
        if cur is not None and cur[3]:
            per_db[cur[0]].append((cur[1], cur[2], cur[3], cur[4]))
        cur = None

    for t in range(tb.size - 1):
        lo, hi = int(tb[t]), int(tb[t + 1])
        tdb, tsb = int(db[lo]), int(sb[lo])
        dl_tile = dloc_all[lo:hi]               # ascending within the tile
        pos = lo
        while pos < hi:
            dl = int(dloc_all[pos])
            if cur is not None and (cur[0] != tdb or tsb - cur[1] >= W
                                    or tsb < cur[1]
                                    or dl - cur[2] >= D or dl < cur[2]):
                close()
            if cur is None:
                cur = [tdb, min(tsb, max_w0), min(dl // 8 * 8, srows - D),
                       [], 0]
            # furthest in-tile edge whose dst row stays inside the window
            lim = lo + int(np.searchsorted(dl_tile, cur[2] + D))
            take = min(chunk - cur[4], hi - pos, lim - pos)
            if take == 0:
                close()
                continue
            cur[3].append((pos, take, tsb - cur[1]))
            cur[4] += take
            pos += take
            if cur[4] == chunk:
                close()
    close()

    chunks = []                                 # (db, w0, dw0, runs)
    for b in range(n_sblocks):
        run = per_db[b]
        want = _round_up(max(len(run), 1), G)
        chunks.extend((b, w0, dw0, runs) for (w0, dw0, runs, _) in run)
        chunks.extend((b, 0, 0, []) for _ in range(want - len(run)))

    n_chunks = len(chunks)
    n_super = n_chunks // G
    n_slots = n_chunks * chunk
    idsx = np.full((8, n_slots), -1, np.int32)
    idsx[2:8] = 0
    sdb = np.asarray([c[0] for c in chunks], np.int32)[::G].copy()
    w0_arr = np.asarray([c[1] for c in chunks], np.int32)
    dw0_arr = np.asarray([c[2] for c in chunks], np.int32)

    # vectorized slot materialization from (pos, take, woff) run descriptors
    starts, takes, woffs, dw0s, slot0 = [], [], [], [], []
    for ci, (_, _, dw0, runs) in enumerate(chunks):
        at = ci * chunk
        for pos, take, woff in runs:
            starts.append(pos)
            takes.append(take)
            woffs.append(woff)
            dw0s.append(dw0)
            slot0.append(at)
            at += take
    if takes:
        starts = np.asarray(starts, np.int64)
        takes = np.asarray(takes, np.int64)
        woffs = np.asarray(woffs, np.int32)
        dw0s = np.asarray(dw0s, np.int32)
        slot0 = np.asarray(slot0, np.int64)
        total = int(takes.sum())
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(takes)[:-1]]), takes)
        epos = np.repeat(starts, takes) + off      # index into sorted edges
        slot = np.repeat(slot0, takes) + off       # destination slot
        ea_bits = np.ascontiguousarray(edge_attr).view(np.int32)
        idsx[0, slot] = dloc_all[epos] - np.repeat(dw0s, takes)
        idsx[1, slot] = (np.repeat(woffs, takes) * ROWS
                         + (src_r[epos] % ROWS)).astype(np.int32)
        idsx[2:2 + fe, slot] = ea_bits[eidx[epos]].T

    assert (dw0_arr % 8 == 0).all(), "v5 packer: dw0 not 8-aligned"
    conv = (lambda x: x) if as_numpy else jnp.asarray
    return EdgeKernelV5Meta(
        idsx=conv(_pack_idsx(idsx)), w0=conv(w0_arr),
        dw0=conv(dw0_arr), sdb=conv(sdb),
        chunk=chunk, W=W, G=G, D=D, S=S, n_slots=n_slots, n_chunks=n_chunks,
        n_super=n_super, n_blocks=n_blocks, eattr_fe=fe)


# ---------------------------------------------------------------------------
# packing (weights / node table)
# ---------------------------------------------------------------------------


def build_tab_v5(h, x, W1, b1, cd, n_seg_pad):
    """Two [n_seg_pad, 80] role tables: dst = [Ud | x_hi | x_lo], src =
    [Us | -x_hi | -x_lo] (coordinate blocks 8-row-aligned at 64 and 72).

    Assembled as ONE [n_seg_pad, 70] x [70, 160] matmul instead of a
    12-piece concatenate: the concat materialised 4 extra MB per layer and
    showed up as ~0.05 ms/layer of pure-copy XLA ops in the round-4 step
    trace; the big-weight dot writes the tables once, with the +-x_hi/x_lo
    columns riding exact 1.0/-1.0 rows (bf16 * 1.0 products accumulate
    exactly in f32).  80-column roles (vs the 128-col roles of v5.0, which
    carried 48 zero columns) cut the in-kernel gather-dot streaming and the
    chain's vector-register footprint ~37%."""
    N = h.shape[0]
    H = H_MAX
    x_hi = x.astype(cd)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(cd)
    inall = jnp.concatenate([h.astype(cd), x_hi, x_lo], axis=1)  # [N, 70]
    inall = jnp.pad(inall, ((0, n_seg_pad - N), (0, 0)))
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def role(Wrole, sign, bias):
        Bw = jnp.zeros((H + 6, 80), jnp.float32)
        Bw = Bw.at[0:H, 0:H].set(Wrole)                    # U = h W1_role
        Bw = Bw.at[H:H + 3, H:H + 3].set(sign * eye3)      # x_hi at 64:67
        Bw = Bw.at[H + 3:, H + 8:H + 11].set(sign * eye3)  # x_lo at 72:75
        out = jax.lax.dot_general(
            inall, Bw.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + jnp.pad(bias, (0, 80 - H))
        return out.astype(cd)

    return role(W1[0:H], 1.0, b1), role(W1[H:2 * H], -1.0, None)


def pack_w_v5(W1, b1, W2, b2, Wg1, bg1, wg2, fe, cd):
    """wp [256, 64]: W1d | W1s | W2 | Wg1 rows (all [in, out]);
    eW [6, 64]: W1 edge-attr rows;
    vpc [64, 8] f32 columns: 0 w1r | 1 wg2 | 2 b2 | 3 bg1."""
    H = H_MAX
    wp = jnp.concatenate([W1[0:H], W1[H:2 * H], W2, Wg1], axis=0).astype(cd)
    eW = jnp.zeros((EA_ROWS, H), jnp.float32)
    eW = eW.at[0:fe].set(W1[2 * H + 1:])
    vpc = jnp.zeros((H, 8), jnp.float32)
    vpc = vpc.at[:, 0].set(W1[2 * H])
    vpc = vpc.at[:, 1].set(wg2[:, 0])
    vpc = vpc.at[:, 2].set(b2)
    vpc = vpc.at[:, 3].set(bg1)
    return wp, eW.astype(cd), vpc


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _gather(tabd_ref, tabs_ref, eW_ref, sdb_ref, w0_ref, dw0_ref, blk, c,
            cg, W, D, S, cd):
    """One-hot gather dots for one chunk; returns bigT [80, chunk] f32
    (rows 0:64 Ud[dst]+Us[src], 64:72 hi(xd-xs), 72:80 lo) + masks.
    The dst one-hot covers only the chunk's D-row dst window."""
    chunk = blk.shape[1]
    ids = blk[0:1, :]
    dl = jax.lax.shift_right_arithmetic(ids, 9) - 1   # sentinel -1 -> -2
    gl = jax.lax.bitwise_and(ids, 511)                # sentinel -> 511
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (D, chunk), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (W * ROWS, chunk), 0)
    PdT = (iota_d == dl).astype(cd)
    PsT = (iota_s == gl).astype(cd)
    eaT = jax.lax.bitcast_convert_type(blk[1:4, :], jnp.float32).astype(cd)
    td = tabd_ref[
        pl.ds(pl.multiple_of(sdb_ref[c] * (S * ROWS) + dw0_ref[cg], 8), D), :]
    tw = tabs_ref[pl.ds(w0_ref[cg] * ROWS, W * ROWS), :]
    bigT = jax.lax.dot_general(
        td, PdT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bigT = bigT + jax.lax.dot_general(
        tw, PsT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ea_z1T = jax.lax.dot_general(
        eW_ref[:], eaT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dict(PdT=PdT, PsT=PsT, eaT=eaT, bigT=bigT, ea_z1T=ea_z1T)


def _chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd):
    """Feature-major MLP/gate chain over the G-wide [128, R] gather.

    Pre-activations cast to ``cd`` before the transcendental chain: the
    kernel is VPU-traffic-bound and bf16 halves the bytes of the ~9 [64, R]
    chain intermediates; dots still accumulate f32.  The f32 path is
    bit-identical (the cast is a no-op)."""
    H = H_MAX
    wp = wp_ref[:]
    vpc = vpc_ref[:]
    diff = bigT[64:72] + bigT[72:80]                      # [8, R] f32 exact
    radial = jnp.sum(diff * diff, axis=0, keepdims=True)  # [1, R]
    z1 = (bigT[0:H] + jnp.broadcast_to(radial, (H, radial.shape[1]))
          * vpc[:, 0:1] + ea_z1T).astype(cd)
    a1, s1 = _silu_f32(z1)
    z2 = (jax.lax.dot_general(
        wp[2 * H:3 * H], a1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + vpc[:, 2:3]).astype(cd)
    m, s2 = _silu_f32(z2)
    zg = (jax.lax.dot_general(
        wp[3 * H:4 * H], m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + vpc[:, 3:4]).astype(cd)
    g1, sg = _silu_f32(zg)
    gate = jnp.sum(
        g1.astype(jnp.float32) * vpc[:, 1:2], axis=0, keepdims=True)
    trans = diff * jnp.broadcast_to(gate, diff.shape)        # [8, R] f32
    return dict(diff=diff, radial=radial, z1=z1, s1=s1, a1=a1, z2=z2, s2=s2,
                m=m, zg=zg, sg=sg, g1=g1, gate=gate, trans=trans)


def _chain_bwd(w, deT, wp_ref, vpc_ref, cd):
    """Backward through the chain.  deT [128, R]: rows 0:64 d(m_sum)
    gathered to slots, 64:72 d(t_sum) (rows 3:8 zero)."""
    H = H_MAX
    wp = wp_ref[:]
    vpc = vpc_ref[:]
    dm_e = deT[0:H]
    dt_e = deT[64:72]
    d_gate = jnp.sum(w["diff"] * dt_e, axis=0, keepdims=True)
    d_diff = dt_e * jnp.broadcast_to(w["gate"], dt_e.shape)
    d_zg = (jnp.broadcast_to(d_gate, (H, d_gate.shape[1])) * vpc[:, 1:2]
            ) * _dsilu(w["zg"], w["sg"])
    d_zg_c = d_zg.astype(cd)
    d_m = dm_e + jax.lax.dot_general(
        wp[3 * H:4 * H], d_zg_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_z2 = d_m * _dsilu(w["z2"], w["s2"])
    d_z2_c = d_z2.astype(cd)
    d_a1 = jax.lax.dot_general(
        wp[2 * H:3 * H], d_z2_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_z1 = d_a1 * _dsilu(w["z1"], w["s1"])
    d_radial = jnp.sum(d_z1 * vpc[:, 0:1], axis=0, keepdims=True)
    d_diff = d_diff + 2.0 * w["diff"] * jnp.broadcast_to(
        d_radial, w["diff"].shape)
    return dict(d_z1=d_z1, d_diff=d_diff, d_z2=d_z2, d_z2_c=d_z2_c,
                d_zg=d_zg, d_zg_c=d_zg_c, d_gate=d_gate)


def _fwd_kernel(sdb_ref, w0_ref, dw0_ref, wp_ref, eW_ref, vpc_ref,
                tabd_ref, tabs_ref, idsx_ref, out_ref, *, G, W, D, S, cd,
                chunk, splits=1):
    c = pl.program_id(0)
    first = jnp.logical_or(
        c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # splits > 1 processes the superchunk in independent sub-pipelines so
    # the Mosaic scheduler can overlap one slice's MXU scatter dots with the
    # next slice's VPU chain
    P = G // splits
    for s in range(splits):
        grange = range(s * P, (s + 1) * P)
        gs = [
            _gather(tabd_ref, tabs_ref, eW_ref, sdb_ref, w0_ref, dw0_ref,
                    idsx_ref[:, g * chunk:(g + 1) * chunk], c, c * G + g, W,
                    D, S, cd)
            for g in grange
        ]
        bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
        ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
        w = _chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
        t_hi, t_lo = _hi_lo(w["trans"], cd)
        scat_T = jnp.concatenate([w["m"], t_hi, t_lo], axis=0)   # [80, R]
        for i, g in enumerate(grange):
            d = jax.lax.dot_general(
                gs[i]["PdT"], scat_T[:, i * chunk:(i + 1) * chunk],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            o = pl.multiple_of(dw0_ref[c * G + g], 8)
            out_ref[pl.ds(o, D), :] += d


def _bwd_kernel(sdb_ref, w0_ref, dw0_ref, wp_ref, eW_ref, vpc_ref,
                tabd_ref, tabs_ref, idsx_ref, dout_ref,
                daccd_ref, daccs_ref, dw_ref, *, G, W, D, S, cd, chunk,
                splits=1):
    H = H_MAX
    c = pl.program_id(0)
    first = jnp.logical_or(
        c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

    @pl.when(c == 0)
    def _():
        daccs_ref[:] = jnp.zeros_like(daccs_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(first)
    def _():
        daccd_ref[:] = jnp.zeros_like(daccd_ref)

    P = G // splits
    dw_acc = None
    for s in range(splits):
        grange = range(s * P, (s + 1) * P)
        gs = []
        des = []
        for g in grange:
            cg = c * G + g
            blk = idsx_ref[:, g * chunk:(g + 1) * chunk]
            f = _gather(tabd_ref, tabs_ref, eW_ref, sdb_ref, w0_ref,
                        dw0_ref, blk, c, cg, W, D, S, cd)
            gs.append(f)
            o = pl.multiple_of(dw0_ref[cg], 8)
            dout_c = dout_ref[pl.ds(o, D), :]                # [D, 72] cd
            des.append(jax.lax.dot_general(
                dout_c, f["PdT"], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # [72f, chunk]
        bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
        ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
        deT = jnp.concatenate(des, axis=1)
        w = _chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
        b = _chain_bwd(w, deT, wp_ref, vpc_ref, cd)

        d_z1_c = b["d_z1"].astype(cd)
        dhi, dlo = _hi_lo(b["d_diff"], cd)
        dstuff = jnp.concatenate([d_z1_c, dhi, dlo], axis=0)   # [80, R]

        # dst-role scatter into the streamed per-block accumulator
        for i, g in enumerate(grange):
            d = jax.lax.dot_general(
                gs[i]["PdT"], dstuff[:, i * chunk:(i + 1) * chunk],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            o = pl.multiple_of(dw0_ref[c * G + g], 8)
            daccd_ref[pl.ds(o, D), :] += d

        # src-role scatter: resident accumulator, RMW per chunk
        for i, g in enumerate(grange):
            cg = c * G + g
            dsw = jax.lax.dot_general(
                gs[i]["PsT"], dstuff[:, i * chunk:(i + 1) * chunk],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [W*128, 80]
            o = pl.multiple_of(w0_ref[cg] * ROWS, ROWS)
            daccs_ref[pl.ds(o, W * ROWS), :] += dsw

        # wide weight grads: rows 0:64 dW2 | 64:128 dWg1 | 128:131 dW1e |
        # 131 dw1r | 132 dwg2 | 133 db2 | 134 dbg1 (cols 0:64)
        dW2 = jax.lax.dot_general(
            w["a1"], b["d_z2_c"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dWg1 = jax.lax.dot_general(
            w["m"], b["d_zg_c"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        eaT = jnp.concatenate([f["eaT"] for f in gs], axis=1)
        dW1e = jax.lax.dot_general(
            eaT, d_z1_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1r = jax.lax.dot_general(
            w["radial"].astype(cd), d_z1_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g1dg = w["g1"] * jnp.broadcast_to(b["d_gate"], w["g1"].shape)
        dwg2 = jnp.sum(g1dg, axis=1, keepdims=True)
        db2 = jnp.sum(b["d_z2"], axis=1, keepdims=True)
        dbg1 = jnp.sum(b["d_zg"], axis=1, keepdims=True)
        part = jnp.concatenate(
            [dW2, dWg1, dW1e, dw1r, dwg2.T, db2.T, dbg1.T,
             jnp.zeros((144 - 135, 64), jnp.float32)], axis=0)
        dw_acc = part if dw_acc is None else dw_acc + part
    dw_ref[:] += dw_acc


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "W", "G", "D", "S", "n_seg_pad",
                     "interpret", "splits", "n_super", "c0"))
def _fwd_impl(meta_arrs, wp, eW, vpc, tabd, tabs, idsx, chunk, W, G, D, S,
              n_seg_pad, interpret, splits=1, n_super=None, c0=0):
    sdb, w0, dw0 = meta_arrs
    if n_super is None:
        n_super = sdb.shape[0]
    cd = tabd.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, G=G, W=W, D=D, S=S, cd=cd,
                              chunk=chunk, splits=splits),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eW
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vpc
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tabd (resident)
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tabs (resident)
                    pl.BlockSpec((4, G * chunk),
                                 lambda c, sdb, w0, dw0: (0, c + c0)),
                ],
                out_specs=pl.BlockSpec(
                    (S * ROWS, 80),
                    lambda c, sdb, w0, dw0: (sdb[c], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 80), jnp.float32),
            interpret=interpret,
        )(sdb, w0, dw0, wp, eW, vpc, tabd, tabs, idsx)


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "W", "G", "D", "S", "n_seg_pad",
                     "interpret", "splits", "n_super", "c0"))
def _bwd_impl(meta_arrs, wp, eW, vpc, tabd, tabs, idsx, dout, chunk, W, G,
              D, S, n_seg_pad, interpret, splits=1, n_super=None, c0=0):
    sdb, w0, dw0 = meta_arrs
    if n_super is None:
        n_super = sdb.shape[0]
    cd = tabd.dtype
    prec = "highest" if cd == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, G=G, W=W, D=D, S=S, cd=cd,
                              chunk=chunk, splits=splits),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # eW
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vpc
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tabd (resident)
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tabs (resident)
                    pl.BlockSpec((4, G * chunk),
                                 lambda c, sdb, w0, dw0: (0, c + c0)),
                    pl.BlockSpec(
                        (S * ROWS, 72),
                        lambda c, sdb, w0, dw0: (sdb[c], 0)),  # dout (cd)
                ],
                out_specs=(
                    pl.BlockSpec(
                        (S * ROWS, 80),
                        lambda c, sdb, w0, dw0: (sdb[c], 0)),  # daccd
                    pl.BlockSpec(memory_space=pltpu.VMEM),     # daccs
                    pl.BlockSpec(memory_space=pltpu.VMEM),     # dw
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_pad, 80), jnp.float32),
                jax.ShapeDtypeStruct((n_seg_pad, 80), jnp.float32),
                jax.ShapeDtypeStruct((144, 64), jnp.float32),
            ),
            # the resident role tables + src-grad accumulator lane-pad to
            # 128 and sit ~15 MB; the conservative 16 MB scoped default
            # rejects the graph-group variant (v5e VMEM is 128 MB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(sdb, w0, dw0, wp, eW, vpc, tabd, tabs, idsx, dout)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fused_edge_block_v5(
    h: jax.Array,                 # [N, H]
    x: jax.Array,                 # [N, 3] f32
    meta: EdgeKernelV5Meta,
    W1, b1, W2, b2, Wg1, bg1, wg2,
    compute_dtype=jnp.float32,
):
    """Fully-fused edge block: ``(m_sum [N, H], trans_sum [N, 3])`` — f32
    sums over incoming edges (divide by in-degree outside for means).

    Differentiable in (h, x, weights); Pallas forward AND backward with
    in-kernel gather/scatter on both endpoints.  Same contract as
    the unfused composition (reference math: ``models/FastEGNN.py:102-133``).
    """
    N, H = h.shape
    assert H == H_MAX, "edge kernel v5 assumes hidden == 64"
    Fe = meta.eattr_fe
    cd = jnp.dtype(compute_dtype)
    chunk, W, G, D, S = meta.chunk, meta.W, meta.G, meta.D, meta.S
    # node-table rows padded to the largest window AND a multiple of the
    # streamed (S*ROWS, 128) output BlockSpec (W*ROWS can dominate without
    # being a multiple of S*ROWS)
    n_seg_pad = _round_up(max(N, W * ROWS, S * ROWS), S * ROWS)
    interpret = jax.default_backend() != "tpu"
    # packed graph-group layout: the scalar-prefetch arrays are SLICED per
    # group (tiny XLA slices; keeping the full packed arrays in the kernel
    # overflows scoped VMEM) while the big idsx stays whole — its stream
    # index map shifts by super_off superchunks
    c0 = meta.super_off
    n_sup = meta.n_super or meta.sdb.shape[0]
    if c0 or n_sup != meta.sdb.shape[0]:
        G_ = meta.G
        sdb_g = jax.lax.slice_in_dim(meta.sdb, c0, c0 + n_sup)
        w0_g = jax.lax.slice_in_dim(meta.w0, c0 * G_, (c0 + n_sup) * G_)
        dw0_g = jax.lax.slice_in_dim(meta.dw0, c0 * G_, (c0 + n_sup) * G_)
    else:
        sdb_g, w0_g, dw0_g = meta.sdb, meta.w0, meta.dw0
    import os as _os

    # sub-pipeline factor (see _fwd_kernel): number of independent
    # gather->chain->scatter slices per superchunk, swept on chip
    def _splits(env, default):
        v = int(_os.environ.get(env, default))
        return v if v >= 1 and G % v == 0 else 1

    fwd_splits = _splits("FASTEGNN_V5_FSPLITS", 1)
    bwd_splits = _splits("FASTEGNN_V5_BSPLITS", 1)
    meta_arrs = (sdb_g, w0_g, dw0_g)
    idsx = meta.idsx

    @jax.custom_vjp
    def f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        return fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)[0]

    def fwd(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        tabd, tabs = build_tab_v5(h, x, W1, b1, cd, n_seg_pad)
        wp, eW, vpc = pack_w_v5(W1, b1, W2, b2, Wg1, bg1, wg2, Fe, cd)
        out = _fwd_impl(meta_arrs, wp, eW, vpc, tabd, tabs, idsx,
                        chunk, W, G, D, S, n_seg_pad, interpret,
                        splits=fwd_splits, n_super=n_sup, c0=c0)
        m_sum = out[:N, 0:H]
        t_sum = (out[:N, H:H + 8] + out[:N, H + 8:H + 16])[:, 0:3]
        return (m_sum, t_sum), (h, tabd, tabs, wp, eW, vpc, W1)

    def bwd(res, g):
        h, tabd, tabs, wp, eW, vpc, W1 = res
        d_msum, d_tsum = g
        # compact cd-dtype upstream-grad table [n_seg_pad, 72]: cols 0:64
        # d_msum, 64:72 d_tsum (the kernel cast dout to cd anyway; building
        # it in cd halves the stream bytes and replaces the round-4 trace's
        # 0.05 ms/layer dynamic-update-slice with a pad)
        dout = jnp.pad(
            jnp.concatenate(
                [d_msum.astype(cd),
                 jnp.pad(d_tsum.astype(jnp.float32), ((0, 0), (0, 5))
                         ).astype(cd)], axis=1),
            ((0, n_seg_pad - N), (0, 0)))
        daccd, daccs, dw = _bwd_impl(
            meta_arrs, wp, eW, vpc, tabd, tabs, idsx, dout,
            chunk, W, G, D, S, n_seg_pad, interpret, splits=bwd_splits,
            n_super=n_sup, c0=c0)
        # epilogue: per-node dUd/dUs -> dh, dW1, db1 (three XLA matmuls)
        dUd = daccd[:N, 0:H]
        dUs = daccs[:N, 0:H]
        dh = (
            jax.lax.dot_general(
                dUd.astype(cd), W1[0:H].astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                dUs.astype(cd), W1[H:2 * H].astype(cd),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        ).astype(h.dtype)
        hc = h.astype(cd)
        dW1d = jax.lax.dot_general(
            hc, dUd.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dW1s = jax.lax.dot_general(
            hc, dUs.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1 = jnp.sum(dUd, axis=0)
        # x grads: dst role stored +x, src role stored -x (sign fold)
        dxd = daccd[:N, H:H + 8] + daccd[:N, H + 8:H + 16]
        dxs = daccs[:N, H:H + 8] + daccs[:N, H + 8:H + 16]
        dx = (dxd - dxs)[:, 0:3]
        dW1 = jnp.concatenate(
            [dW1d, dW1s, dw[131:132], dw[128:128 + Fe]], axis=0)
        return (dh, dx, dW1, db1, dw[0:64], dw[133], dw[64:128], dw[134],
                dw[132][:, None])

    f.defvjp(fwd, bwd)
    return f(h, x, W1, b1, W2, b2, Wg1, bg1, wg2)
