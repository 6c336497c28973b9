"""Numpy oracle: faithful transcription of the reference TFN math, DGL-free.

Transcribes (behaviour only, from /root/reference — see file:line cites):

- real spherical harmonics via the memoized associated-Legendre recursion
  (``models/se3_dynamics/equivariant_attention/from_se3cnn/representations.py:103-206``),
  evaluated with the reference's spherical-coordinate convention
  (``utils_steerable.py:71-121``: cartesian roles x<-v[2], y<-v[0], z<-v[1];
  ``theta = pi - beta``, ``utils_steerable.py:289``);
- real Wigner-D ``irr_repr`` (lie_learn's ``wigner_D_matrix`` as consumed at
  ``from_se3cnn/SO3.py:77-92``), reconstructed from the explicit complex
  wigner-d sum + the real<->complex unitary; the convention is pinned by the
  representation property  Y_J(P^T R P x) = D_J(R) Y_J(x)  against the
  transcribed SH (verified in scripts/tfn_oracle_proto.py and re-asserted in
  tests);
- the ``Q_J`` basis-transformation solve: Sylvester null space by SVD over
  the same five fixed random angles (``utils_steerable.py:35-67``),
  with the same uniqueness + representation-property asserts;
- ``get_basis`` kernel assembly (``modules.py:19-49``);
- ``RadialFunc`` / ``PairwiseConv`` / ``GConvSE3.udf_u_mul_e`` + ``update_all``
  mean aggregation as explicit loops (``modules.py:82-266``), ``G1x1SE3``
  (``:269-299``), ``GNormSE3`` (``:302-367``, LayerNorm eps = torch default
  1e-5), and ``GMABSE3`` attention with per-destination edge_softmax
  (``:470-552``).

Everything is float64-capable numpy; no torch, dgl, or lie_learn.
"""

from __future__ import annotations

from math import factorial, pi, sqrt

import numpy as np

# -----------------------------------------------------------------------------
# reference real spherical harmonics (representations.py:103-206)
# -----------------------------------------------------------------------------


def semifactorial(x: int) -> float:
    y = 1.0
    for n in range(x, 1, -2):
        y *= n
    return y


def pochhammer(x: int, k: int) -> float:
    y = 1.0
    for n in range(x, x + k):
        y *= n
    return y


class SphericalHarmonics:
    """Memoized lpmv recursion, Condon-Shortley phase included."""

    def __init__(self):
        self.leg = {}

    def lpmv(self, l, m, x):
        m_abs = abs(m)
        if (l, m) in self.leg:
            return self.leg[(l, m)]
        if m_abs > l:
            return None
        if l == 0:
            self.leg[(l, m)] = np.ones_like(x)
            return self.leg[(l, m)]
        if m_abs == l:
            y = (-1) ** m_abs * semifactorial(2 * m_abs - 1)
            y = y * np.power(1 - x * x, m_abs / 2)
            if m < 0:
                y = y * ((-1) ** m / pochhammer(l + m + 1, -2 * m))
            self.leg[(l, m)] = y
            return y
        self.lpmv(l - 1, m, x)
        y = ((2 * l - 1) / (l - m_abs)) * x * self.lpmv(l - 1, m_abs, x)
        if l - m_abs > 1:
            y = y - ((l + m_abs - 1) / (l - m_abs)) * self.leg[(l - 2, m_abs)]
        if m < 0:
            y = y * ((-1) ** m / pochhammer(l + m + 1, -2 * m))
        self.leg[(l, m)] = y
        return y

    def get_element(self, l, m, theta, phi):
        N = sqrt((2 * l + 1) / (4 * pi))
        leg = self.lpmv(l, abs(m), np.cos(theta))
        if m == 0:
            return N * leg
        if m > 0:
            Y = np.cos(m * phi) * leg
        else:
            Y = np.sin(abs(m) * phi) * leg
        N *= sqrt(2.0 / pochhammer(l - abs(m) + 1, 2 * abs(m)))
        return N * Y

    def get(self, l, theta, phi):
        self.leg = {}
        return np.stack(
            [self.get_element(l, m, theta, phi) for m in range(-l, l + 1)], -1
        )


def spherical_from_cartesian(cart: np.ndarray) -> np.ndarray:
    """(r, alpha, beta) with the reference's axis roles
    (``utils_steerable.py:95-121``: cartesian_x=2, cartesian_y=0, cartesian_z=1)."""
    cx, cy, cz = cart[..., 2], cart[..., 0], cart[..., 1]
    r_xy = cx**2 + cy**2
    beta = np.arctan2(np.sqrt(r_xy), cz)
    alpha = np.arctan2(cy, cx)
    r = np.sqrt(r_xy + cz**2)
    return np.stack([r, alpha, beta], -1)


def precompute_sh(r_ij: np.ndarray, max_J: int) -> dict:
    """Y_J dict over edge spherical coords (``utils_steerable.py:273-295``)."""
    sh = SphericalHarmonics()
    return {
        J: sh.get(J, theta=pi - r_ij[..., 2], phi=r_ij[..., 1])
        for J in range(max_J + 1)
    }


# -----------------------------------------------------------------------------
# real Wigner-D (lie_learn convention as consumed by SO3.py irr_repr)
# -----------------------------------------------------------------------------


def wigner_small_d(l: int, beta: float) -> np.ndarray:
    d = np.zeros((2 * l + 1, 2 * l + 1))
    cb, sb = np.cos(beta / 2.0), np.sin(beta / 2.0)
    for i, mp in enumerate(range(-l, l + 1)):
        for j, m in enumerate(range(-l, l + 1)):
            pref = sqrt(
                factorial(l + mp) * factorial(l - mp)
                * factorial(l + m) * factorial(l - m)
            )
            s = 0.0
            for k in range(0, 2 * l + 1):
                denom = [k, l + m - k, l - mp - k, mp - m + k]
                if any(dd < 0 for dd in denom):
                    continue
                s += (
                    (-1) ** (mp - m + k)
                    / (factorial(k) * factorial(l + m - k)
                       * factorial(l - mp - k) * factorial(mp - m + k))
                    * cb ** (2 * l + m - mp - 2 * k)
                    * sb ** (mp - m + 2 * k)
                )
            d[i, j] = pref * s
    return d


def _real_to_complex_U(l: int) -> np.ndarray:
    s2 = 1.0 / sqrt(2.0)
    U = np.zeros((2 * l + 1, 2 * l + 1), complex)
    for m in range(1, l + 1):
        U[m + l, m + l] = (-1) ** m * s2
        U[m + l, -m + l] = -1j * (-1) ** m * s2
        U[-m + l, m + l] = s2
        U[-m + l, -m + l] = 1j * s2
    U[l, l] = 1.0
    return U


def irr_repr(l: int, a: float, b: float, g: float) -> np.ndarray:
    """Real Wigner-D; satisfies Y_l(P^T rot(a,b,g) P x) = D Y_l(x) for the
    transcribed reference SH (P = the axis-role permutation)."""
    mr = np.arange(-l, l + 1)
    Dc = (
        np.exp(-1j * mr[:, None] * a)
        * wigner_small_d(l, b)
        * np.exp(-1j * mr[None, :] * g)
    )
    U = _real_to_complex_U(l)
    D = np.conj(U).T @ Dc @ U
    assert np.abs(np.imag(D)).max() < 1e-9
    return np.real(D)


def rot(a, b, g):
    """ZYZ rotation (reference SO3.py:26-56)."""
    def rz(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    def ry(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])

    return rz(a) @ ry(b) @ rz(g)


# the axis-role permutation: v_ref_frame = AXIS_PERM @ v_physical
AXIS_PERM = np.array([[0.0, 0, 1], [1, 0, 0], [0, 1, 0]])


# -----------------------------------------------------------------------------
# Q_J solve (utils_steerable.py:12-67), scipy-free SVD null space
# -----------------------------------------------------------------------------

RANDOM_ANGLES = [
    [4.41301023, 5.56684102, 4.59384642],
    [4.93325116, 6.12697327, 4.14574096],
    [0.53878964, 4.09050444, 5.36539036],
    [2.16017393, 3.48835314, 5.55174441],
    [2.52385107, 0.2908958, 3.90040975],
]


def basis_transformation_Q_J(J: int, order_in: int, order_out: int) -> np.ndarray:
    """One part of the Q^-1 matrix: [(2*order_out+1)*(2*order_in+1), 2J+1]."""

    def _R_tensor(a, b, c):
        return np.kron(irr_repr(order_out, a, b, c), irr_repr(order_in, a, b, c))

    def _sylvester_submatrix(a, b, c):
        R_tensor = _R_tensor(a, b, c)
        R_irrep_J = irr_repr(J, a, b, c)
        return np.kron(R_tensor, np.eye(R_irrep_J.shape[0])) - np.kron(
            np.eye(R_tensor.shape[0]), R_irrep_J.T
        )

    A = np.concatenate(
        [_sylvester_submatrix(a, b, c) for a, b, c in RANDOM_ANGLES], axis=0
    )
    _u, s, vt = np.linalg.svd(A)
    null = vt[np.abs(s) < 1e-10]
    assert null.shape[0] == 1, f"non-unique null space {null.shape}"
    Q_J = null[0].reshape((2 * order_out + 1) * (2 * order_in + 1), 2 * J + 1)
    rng = np.random.default_rng(0)
    for a, b, c in rng.uniform(0, 2 * pi, (4, 3)):
        assert np.allclose(
            _R_tensor(a, b, c) @ Q_J, Q_J @ irr_repr(J, a, b, c), atol=1e-9
        ), "Q_J representation property failed"
    return Q_J


def get_basis(edge_vec: np.ndarray, max_degree: int) -> dict:
    """Equivariant kernel bases (``modules.py:19-76``).

    Returns ``{(d_in, d_out): [E, 2*d_out+1, 2*d_in+1, n_freq]}`` (the
    reference's singleton channel axes squeezed out).
    """
    r_ij = spherical_from_cartesian(edge_vec)
    Y = precompute_sh(r_ij, 2 * max_degree)
    basis = {}
    for d_in in range(max_degree + 1):
        for d_out in range(max_degree + 1):
            K_Js = []
            for J in range(abs(d_in - d_out), d_in + d_out + 1):
                Q_J = basis_transformation_Q_J(J, d_in, d_out)  # [oi, 2J+1]
                K_J = Y[J] @ Q_J.T  # [E, (2do+1)*(2di+1)]
                K_Js.append(K_J)
            E = edge_vec.shape[0]
            basis[(d_in, d_out)] = np.stack(K_Js, -1).reshape(
                E, 2 * d_out + 1, 2 * d_in + 1, 2 * min(d_in, d_out) + 1
            )
    return basis


# -----------------------------------------------------------------------------
# layers (explicit-loop transcriptions of modules.py; flax [in,out] kernels)
# -----------------------------------------------------------------------------


def layer_norm(x: np.ndarray, scale, bias, eps: float = 1e-5) -> np.ndarray:
    """torch nn.LayerNorm over the last axis (default eps 1e-5)."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def radial_func(feat: np.ndarray, w: dict, num_freq, m_in, m_out,
                act=lambda v: np.maximum(v, 0.0)) -> np.ndarray:
    """RadialFunc (``modules.py:192-227``): Linear/LN/act x2 + Linear;
    returns [E, m_out, m_in, num_freq].  ``w`` holds flax-layout params
    (``kernel`` [in,out], ``bias``; LN ``scale``/``bias``)."""
    y = feat @ w["lin0"]["kernel"] + w["lin0"]["bias"]
    y = act(layer_norm(y, w["bn0"]["scale"], w["bn0"]["bias"]))
    y = y @ w["lin1"]["kernel"] + w["lin1"]["bias"]
    y = act(layer_norm(y, w["bn1"]["scale"], w["bn1"]["bias"]))
    y = y @ w["lin2"]["kernel"] + w["lin2"]["bias"]
    # reference view: (-1, out_dim, 1, in_dim, 1, num_freq)
    return y.reshape(-1, m_out, m_in, num_freq)


def pairwise_conv(feat, basis, w, d_in, m_in, d_out, m_out):
    """PairwiseConv (``modules.py:230-266``): kernel[e, m_out, 2do+1, m_in, 2di+1]."""
    num_freq = 2 * min(d_in, d_out) + 1
    R = radial_func(feat, w, num_freq, m_in, m_out)  # [E, mo, mi, F]
    K = basis[(d_in, d_out)]                         # [E, O, I, F]
    # reference: R [E,mo,1,mi,1,F] * basis [E,1,O,1,I,F] summed over F
    return np.einsum("emnf,eoif->emoni", R, K)


def gconv_se3(h, edge_index, edge_feat, basis, params, f_in, f_out,
              self_interaction=False, n_nodes=None):
    """GConvSE3 forward (``modules.py:127-189``) as explicit loops.

    ``edge_index = (u, v)`` in DGL terms: messages flow u -> v, aggregated
    at v with fn.mean.  ``params[f'pair_{di}_{do}']`` are RadialFunc weights;
    ``params[f'self_{do}']`` the [m_out, m_in] self-interaction matrices.
    """
    u, v = edge_index
    N = n_nodes if n_nodes is not None else int(max(u.max(), v.max())) + 1
    out = {}
    for (mo, do) in f_out:
        E = u.shape[0]
        msg = np.zeros((E, mo, 2 * do + 1))
        for (mi, di) in f_in:
            kernel = pairwise_conv(
                edge_feat, basis, params[f"pair_{di}_{do}"], di, mi, do, mo
            )  # [E, mo, O, mi, I]
            src = h[di][u]  # edges.src -> DGL source = u
            msg += np.einsum("emoni,eni->emo", kernel, src)
        if self_interaction and f"self_{do}" in params:
            W = params[f"self_{do}"]  # [mo, mi]
            dst = h[do][v]
            msg += np.einsum("mn,eni->emi", W, dst)
        # update_all(fn.mean) at the DGL destination v
        agg = np.zeros((N, mo, 2 * do + 1))
        cnt = np.zeros((N,))
        for e in range(E):
            agg[v[e]] += msg[e]
            cnt[v[e]] += 1.0
        out[do] = agg / np.maximum(cnt, 1.0)[:, None, None]
    return out


def gconv_se3_partial(h, edge_index, edge_feat, basis, params, f_in, f_out):
    """GConvSE3Partial (``modules.py:385-467``): per-edge messages, no agg."""
    u, _v = edge_index
    out = {}
    for (mo, do) in f_out:
        E = u.shape[0]
        msg = np.zeros((E, mo, 2 * do + 1))
        for (mi, di) in f_in:
            kernel = pairwise_conv(
                edge_feat, basis, params[f"pair_{di}_{do}"], di, mi, do, mo
            )
            msg += np.einsum("emoni,eni->emo", kernel, h[di][u])
        out[do] = msg
    return out


def g1x1_se3(h, params, f_in, f_out):
    """G1x1SE3 (``modules.py:269-299``): per-degree [mo, mi] mixing."""
    return {
        do: np.einsum("mn,xni->xmi", params[f"w_{do}"], h[do])
        for (mo, do) in f_out
    }


def gnorm_se3(h, params, fiber, num_layers=0,
              act=lambda v: np.maximum(v, 0.0), eps=1e-12):
    """GNormSE3 (``modules.py:302-367``): norm -> LN/act [/linear] -> * phase."""
    out = {}
    for (m, d) in fiber:
        v = h[d]
        norm = np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), eps)
        phase = v / norm
        t = norm[..., 0]  # [N, m]
        p = params[d]
        if num_layers == 0:
            t = act(layer_norm(t, p["bn_scale"], p["bn_bias"]))
        else:
            for i in range(num_layers):
                t = act(layer_norm(t, p[f"bn_scale_{i}"], p[f"bn_bias_{i}"]))
                t = t @ p[f"lin_kernel_{i}"]
                if i == num_layers - 1:
                    t = t + p[f"lin_bias_{i}"]
        out[d] = t[..., None] * phase
    return out


def gmab_se3(v_edge, k_edge, q_node, edge_index, f_value, f_key, n_heads,
             n_nodes=None):
    """GMABSE3 (``modules.py:470-552``): e_dot_v + per-dst edge_softmax + sum."""
    u, vv = edge_index
    N = n_nodes if n_nodes is not None else int(max(u.max(), vv.max())) + 1
    E = u.shape[0]

    def fiber2head(hd, fiber):
        return np.concatenate(
            [hd[d].reshape(hd[d].shape[0], n_heads, -1) for (m, d) in fiber],
            axis=-1,
        )

    k = fiber2head(k_edge, f_key)       # [E, H, F]
    q = fiber2head(q_node, f_key)       # [N, H, F]
    n_feat = sum(m * (2 * d + 1) for (m, d) in f_key)
    e = np.einsum("ehf,ehf->eh", k, q[vv]) / sqrt(n_feat)
    # edge_softmax: per destination node vv
    a = np.zeros_like(e)
    for n in range(N):
        sel = vv == n
        if sel.any():
            x = e[sel]
            x = np.exp(x - x.max(0, keepdims=True))
            a[sel] = x / x.sum(0, keepdims=True)
    out = {}
    for (m, d) in f_value:
        ve = v_edge[d].reshape(E, n_heads, m // n_heads, 2 * d + 1)
        msg = a[..., None, None] * ve
        agg = np.zeros((N, n_heads, m // n_heads, 2 * d + 1))
        for ei in range(E):
            agg[vv[ei]] += msg[ei]
        out[d] = agg.reshape(N, m, 2 * d + 1)
    return out
