"""Charged N-body simulator with rigid composites (offline data generation).

Re-design of the reference generator (``datasets/nbody/datagen/system.py``,
``physical_objects.py``, ``generate_dataset.py``) with the same physics but
vectorised numpy throughout: all sticks update as one ``[S, 2, 3]`` rigid-body
batch, all hinges as ``[Hn, 3, 3]``, instead of per-object Python classes.

Physics (matching the reference exactly):
- charges q in {+1, -1}; pair force size ``strength * q_i q_j / |r|^3``
  multiplied by the unnormalised separation vector, summed over pairs, then
  clamped componentwise to ``|F| <= 0.1/dt`` (``system.py:85-114``).
- positions init N(0, loc_std'), loc_std' = loc_std*(n/5)^(1/3)+0.1
  (``system.py:21``); velocities init N(0,1) normalised to ``vel_norm``
  (``system.py:36-39``).
- isolated balls: semi-implicit Euler ``v += F dt; x += v dt``
  (``physical_objects.py:49-57``).
- sticks: two unit masses rotating rigidly about their centre of mass;
  angular velocity updated by torque/inertia, orientation by axis-angle
  rotation (``physical_objects.py:96-133``).
- hinges: ball 0 joined to balls 1,2 by rigid rods; pivot acceleration from
  the 3x3 constraint solve ``A a0 = rhs`` (``physical_objects.py:179-227``).
- initial velocities are projected so rigid constraints hold
  (``physical_objects.py:69-94,154-177``).

Node ordering differs from the reference (objects take contiguous index
blocks here; the reference scatters them randomly, ``system.py:44-67``) —
distributionally identical since charges are i.i.d.

Trajectories are sampled every ``sample_freq`` steps for ``length`` steps and
saved in the reference's .npy layout (``generate_dataset.py:89-116``):
``loc_{split}_charged{i}_{s}_{h}.npy`` of shape [num_sims, T, n, 3], etc.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

_EPS = 1e-12


def _axis_angle_matrices(w: np.ndarray, dt: float) -> np.ndarray:
    """Rotation matrices for angle |w| dt about axis w/|w|; w: [K, 3] -> [K, 3, 3].

    Rodrigues form, matching ``physical_objects.get_rotation_matrix``
    (``physical_objects.py:10-23``).
    """
    wn = np.linalg.norm(w, axis=-1, keepdims=True)
    theta = (wn * dt)[..., None]  # [K,1,1]
    d = w / np.maximum(wn, _EPS)  # [K,3]
    K = np.zeros(w.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -d[..., 2], d[..., 1]
    K[..., 1, 0], K[..., 1, 2] = d[..., 2], -d[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -d[..., 1], d[..., 0]
    outer = d[..., :, None] * d[..., None, :]
    eye = np.broadcast_to(np.eye(3), K.shape)
    return np.cos(theta) * eye + np.sin(theta) * K + (1 - np.cos(theta)) * outer


def _project(v: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Componentwise projection of v onto d over the last axis (batched)."""
    num = np.sum(v * d, axis=-1, keepdims=True)
    den = np.maximum(np.sum(d * d, axis=-1, keepdims=True), _EPS)
    return num / den * d


class ChargedSystem:
    """One simulation instance: ``n_isolated`` free balls, ``n_stick`` rigid
    pairs, ``n_hinge`` rigid triples.  Node layout: isolated block, then stick
    pairs, then hinge triples (contiguous)."""

    def __init__(
        self,
        n_isolated: int,
        n_stick: int = 0,
        n_hinge: int = 0,
        rng: Optional[np.random.Generator] = None,
        delta_t: float = 0.001,
        loc_std: float = 1.0,
        vel_norm: float = 0.5,
        interaction_strength: float = 1.0,
        box_size: Optional[float] = None,
        gaussians: int = 0,
    ):
        rng = rng or np.random.default_rng()
        self.dt = delta_t
        self.max_f = 0.1 / delta_t
        self.strength = interaction_strength
        self.box_size = box_size
        self.n_isolated, self.n_stick, self.n_hinge = n_isolated, n_stick, n_hinge
        n = n_isolated + 2 * n_stick + 3 * n_hinge
        self.n = n
        std = loc_std * (float(n) / 5.0) ** (1.0 / 3.0) + 0.1

        self.charges = rng.choice([1.0, -1.0], size=(n, 1))
        self.qq = self.charges @ self.charges.T  # pair charge products ("edges")
        if gaussians:
            # Gaussian-mixture initial placement (clustered large graphs),
            # reference ``datasets/nbody/script/system.py:38-76``.  The
            # reference hardcodes the cluster-mean tables for 3 and 10 and
            # splits n//gaussians per listed mean; its 3-cluster table lists
            # only two means, so the particle count falls short of ``n`` and
            # its own shape assert fires (``script/system.py:78``) — here the
            # remainder is assigned to the last cluster so every ``n`` works.
            if gaussians == 3:
                means = [[-25.0, -25.0, -25.0], [25.0, 25.0, 25.0]]
            elif gaussians == 10:
                means = [
                    [50, 50, 50], [50, 50, -50], [50, -50, 50], [50, -50, -50],
                    [-50, 50, 50], [-50, 50, -50], [-50, -50, 50],
                    [-50, -50, -50], [25, 25, 25], [-25, -25, -25],
                ]
            else:
                raise ValueError(
                    f"gaussians must be 0, 3, or 10 (got {gaussians}); "
                    "ref script/system.py:44-63 hardcodes those tables"
                )
            # NOTE: the reference uses raw loc_std (no N-scaling) here
            cnt = n // gaussians
            counts = [cnt] * (len(means) - 1)
            counts.append(n - sum(counts))
            x = np.concatenate(
                [
                    rng.normal(size=(c, 3)) * loc_std + np.asarray(m, float)
                    for c, m in zip(counts, means)
                ]
            )
        else:
            x = rng.normal(size=(n, 3)) * std
        v = rng.normal(size=(n, 3))
        v = v / np.linalg.norm(v, axis=-1, keepdims=True) * vel_norm

        self._i_end = n_isolated
        self._s_end = n_isolated + 2 * n_stick
        # --- stick init: equalise along-stick velocity, derive omega ---
        if n_stick:
            xs = x[self._i_end : self._s_end].reshape(n_stick, 2, 3)
            vs = v[self._i_end : self._s_end].reshape(n_stick, 2, 3)
            d = xs[:, 1] - xs[:, 0]  # [S,3]
            pro = np.stack([_project(vs[:, 0], d), _project(vs[:, 1], d)], axis=1)
            vert = vs - pro
            avg = pro.mean(axis=1, keepdims=True)
            vs = vert + avg
            xc = xs.mean(axis=1)
            vc = vs.mean(axis=1)
            r0 = xs[:, 0] - xc
            w = np.cross(r0, vs[:, 0] - vc) / np.maximum(
                np.sum(r0 * r0, axis=-1, keepdims=True), _EPS
            )
            self.stick_xc, self.stick_vc, self.stick_w = xc, vc, w
            self.stick_len = np.linalg.norm(d, axis=-1)
            x[self._i_end : self._s_end] = xs.reshape(-1, 3)
            v[self._i_end : self._s_end] = vs.reshape(-1, 3)
        # --- hinge init: pivot-projected rod velocities, derive omegas ---
        if n_hinge:
            xh = x[self._s_end :].reshape(n_hinge, 3, 3)
            vh = v[self._s_end :].reshape(n_hinge, 3, 3)
            d1, d2 = xh[:, 1] - xh[:, 0], xh[:, 2] - xh[:, 0]
            v1 = _project(vh[:, 0], d1) + (vh[:, 1] - _project(vh[:, 1], d1))
            v2 = _project(vh[:, 0], d2) + (vh[:, 2] - _project(vh[:, 2], d2))
            vh[:, 1], vh[:, 2] = v1, v2
            w1 = np.cross(d1, v1 - vh[:, 0]) / np.maximum(
                np.sum(d1 * d1, axis=-1, keepdims=True), _EPS
            )
            w2 = np.cross(d2, v2 - vh[:, 0]) / np.maximum(
                np.sum(d2 * d2, axis=-1, keepdims=True), _EPS
            )
            self.hinge_w1, self.hinge_w2 = w1, w2
            self.hinge_len1 = np.linalg.norm(d1, axis=-1)
            self.hinge_len2 = np.linalg.norm(d2, axis=-1)
            x[self._s_end :] = xh.reshape(-1, 3)
            v[self._s_end :] = vh.reshape(-1, 3)

        self.x, self.v = x, v

    # ------------------------------------------------------------------
    def _forces(self) -> np.ndarray:
        x = self.x
        diff = x[:, None, :] - x[None, :, :]          # [n, n, 3] (x_i - x_j)
        r2 = np.sum(diff**2, axis=-1)
        np.fill_diagonal(r2, 1.0)
        size = self.strength * self.qq / np.power(r2, 1.5)
        np.fill_diagonal(size, 0.0)
        f = np.sum(size[..., None] * diff, axis=1)    # [n, 3]
        return np.clip(f, -self.max_f, self.max_f)

    def step(self) -> None:
        f = self._forces()
        dt = self.dt
        # isolated: semi-implicit Euler
        sl = slice(0, self._i_end)
        self.v[sl] += f[sl] * dt
        self.x[sl] += self.v[sl] * dt
        # sticks: rigid-body update
        if self.n_stick:
            xs = self.x[self._i_end : self._s_end].reshape(-1, 2, 3)
            fs = f[self._i_end : self._s_end].reshape(-1, 2, 3)
            xc, vc, w = self.stick_xc, self.stick_vc, self.stick_w
            r = xs - xc[:, None, :]                      # [S,2,3]
            ac = fs.mean(axis=1)
            vc = vc + ac * dt
            xc = xc + vc * dt
            J = np.sum(r * r, axis=(1, 2))               # [S]
            M = np.cross(r, fs).sum(axis=1)              # [S,3]
            w = w + M / J[:, None] * dt
            R = _axis_angle_matrices(w, dt)              # [S,3,3]
            r_new = np.einsum("sij,skj->ski", R, r)
            xs = xc[:, None, :] + r_new
            vs = vc[:, None, :] + np.cross(w[:, None, :], r_new)
            self.stick_xc, self.stick_vc, self.stick_w = xc, vc, w
            self.x[self._i_end : self._s_end] = xs.reshape(-1, 3)
            self.v[self._i_end : self._s_end] = vs.reshape(-1, 3)
        # hinges: constrained pivot + two rotating rods
        if self.n_hinge:
            xh = self.x[self._s_end :].reshape(-1, 3, 3)
            vh = self.v[self._s_end :].reshape(-1, 3, 3)
            fh = f[self._s_end :].reshape(-1, 3, 3)
            w1, w2 = self.hinge_w1, self.hinge_w2
            r01, r02 = xh[:, 1] - xh[:, 0], xh[:, 2] - xh[:, 0]
            v01, v02 = vh[:, 1] - vh[:, 0], vh[:, 2] - vh[:, 0]
            e1 = r01 / np.linalg.norm(r01, axis=-1, keepdims=True)
            e2 = r02 / np.linalg.norm(r02, axis=-1, keepdims=True)
            P1 = e1[:, :, None] * e1[:, None, :]
            P2 = e2[:, :, None] * e2[:, None, :]
            eye = np.broadcast_to(np.eye(3), P1.shape)
            A = eye + P1 + P2
            rhs = (
                fh.sum(axis=1)
                - np.cross(w1, v01)
                - np.cross(w2, v02)
                - np.einsum("hij,hj->hi", eye - P1, fh[:, 1])
                - np.einsum("hij,hj->hi", eye - P2, fh[:, 2])
            )
            a0 = np.linalg.solve(A, rhs[..., None])[..., 0]
            v0 = vh[:, 0] + a0 * dt
            x0 = xh[:, 0] + v0 * dt
            b1 = np.cross(r01, fh[:, 1] - a0) / np.maximum(
                np.sum(r01 * r01, axis=-1, keepdims=True), _EPS
            )
            b2 = np.cross(r02, fh[:, 2] - a0) / np.maximum(
                np.sum(r02 * r02, axis=-1, keepdims=True), _EPS
            )
            w1 = w1 + b1 * dt
            w2 = w2 + b2 * dt
            r01n = np.einsum("hij,hj->hi", _axis_angle_matrices(w1, dt), r01)
            r02n = np.einsum("hij,hj->hi", _axis_angle_matrices(w2, dt), r02)
            x1, x2 = x0 + r01n, x0 + r02n
            v1 = v0 + np.cross(w1, r01n)
            v2 = v0 + np.cross(w2, r02n)
            self.hinge_w1, self.hinge_w2 = w1, w2
            self.x[self._s_end :] = np.stack([x0, x1, x2], axis=1).reshape(-1, 3)
            self.v[self._s_end :] = np.stack([v0, v1, v2], axis=1).reshape(-1, 3)

    # ------------------------------------------------------------------
    def check(self, atol: float = 1e-6) -> None:
        """Rigid-constraint invariants (reference ``physical_objects.py:135-145,229-243``)."""
        if self.n_stick:
            xs = self.x[self._i_end : self._s_end].reshape(-1, 2, 3)
            vs = self.v[self._i_end : self._s_end].reshape(-1, 2, 3)
            d = xs[:, 1] - xs[:, 0]
            assert np.abs(np.linalg.norm(d, axis=-1) - self.stick_len).max() < atol
            p0, p1 = _project(vs[:, 0], d), _project(vs[:, 1], d)
            assert np.abs(p0 - p1).sum(axis=-1).max() < atol
        if self.n_hinge:
            xh = self.x[self._s_end :].reshape(-1, 3, 3)
            vh = self.v[self._s_end :].reshape(-1, 3, 3)
            d1, d2 = xh[:, 1] - xh[:, 0], xh[:, 2] - xh[:, 0]
            assert np.abs(np.linalg.norm(d1, axis=-1) - self.hinge_len1).max() < atol
            assert np.abs(np.linalg.norm(d2, axis=-1) - self.hinge_len2).max() < atol
            assert np.abs(_project(vh[:, 0], d1) - _project(vh[:, 1], d1)).sum(-1).max() < atol
            assert np.abs(_project(vh[:, 0], d2) - _project(vh[:, 2], d2)).sum(-1).max() < atol

    def is_valid(self) -> bool:
        if self.box_size is None:
            return True
        return bool(np.all(np.abs(self.x) <= self.box_size))

    def configuration(self) -> dict:
        cfg: dict = {}
        i = 0
        for _ in range(self.n_isolated):
            cfg.setdefault("Isolated", []).append([i]); i += 1
        for _ in range(self.n_stick):
            cfg.setdefault("Stick", []).append([i, i + 1]); i += 2
        for _ in range(self.n_hinge):
            cfg.setdefault("Hinge", []).append([i, i + 1, i + 2]); i += 3
        return cfg


def simulate_trajectory(
    n_isolated: int,
    n_stick: int,
    n_hinge: int,
    rng: np.random.Generator,
    length: int = 5000,
    sample_freq: int = 100,
    **kwargs,
) -> Tuple[dict, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One valid trajectory; regenerates on invalid like the reference's
    ``while True`` (``generate_dataset.py:52-70``).  Returns
    (cfg, loc [T,n,3], vel [T,n,3], qq [n,n], charges [n,1])."""
    while True:
        sys_ = ChargedSystem(n_isolated, n_stick, n_hinge, rng=rng, **kwargs)
        X, V = [], []
        for t in range(length):
            sys_.step()
            if t % sample_freq == 0:
                X.append(sys_.x.copy())
                V.append(sys_.v.copy())
        sys_.check()
        if sys_.is_valid():
            return (
                sys_.configuration(),
                np.array(X),
                np.array(V),
                sys_.qq,
                sys_.charges,
            )


def _gen_one(n_isolated, n_stick, n_hinge, length, sample_freq, kwargs,
             seed_seq):
    """Worker entry: one trajectory from a spawned SeedSequence (picklable
    top-level function for ProcessPoolExecutor)."""
    rng = np.random.default_rng(seed_seq)
    return simulate_trajectory(
        n_isolated, n_stick, n_hinge, rng, length, sample_freq, **kwargs
    )


def generate_dataset(
    path: str,
    n_isolated: int,
    n_stick: int = 0,
    n_hinge: int = 0,
    num_train: int = 10000,
    num_valid: int = 2000,
    num_test: int = 2000,
    length: int = 5000,
    sample_freq: int = 100,
    seed: int = 42,
    suffix_extra: str = "",
    n_workers: int = 1,
    **kwargs,
) -> str:
    """Generate and save the three splits in the reference's file layout.

    ``n_workers > 1`` parallelises over trajectories (the reference uses
    ``joblib.Parallel(n_jobs=args.n_workers)``, ``generate_dataset.py:74``)
    with per-trajectory seeds spawned from ``seed`` — the output is
    deterministic AND independent of the worker count (though it differs
    from the serial ``n_workers=1`` stream, which keeps the historical
    single-rng draw order for reproducibility of existing datasets).

    Returns the dataset name string (e.g. ``"5_0_0"``) to pass to loaders.
    """
    os.makedirs(path, exist_ok=True)
    name = f"{n_isolated}_{n_stick}_{n_hinge}{suffix_extra}"
    rng = np.random.default_rng(seed)
    split_sizes = [("train", num_train), ("valid", num_valid), ("test", num_test)]
    if n_workers > 1:
        seeds = iter(np.random.SeedSequence(seed).spawn(sum(n for _, n in split_sizes)))
    for split, num in split_sizes:
        if n_workers > 1:
            import concurrent.futures as cf
            import functools

            work = functools.partial(
                _gen_one, n_isolated, n_stick, n_hinge, length, sample_freq,
                kwargs,
            )
            with cf.ProcessPoolExecutor(max_workers=n_workers) as ex:
                results = list(ex.map(work, (next(seeds) for _ in range(num)),
                                      chunksize=8))
            cfgs = [r[0] for r in results]
            locs = [r[1] for r in results]
            vels = [r[2] for r in results]
            qqs = [r[3] for r in results]
            charges = [r[4] for r in results]
        else:
            cfgs, locs, vels, qqs, charges = [], [], [], [], []
            for _ in range(num):
                cfg, loc, vel, qq, q = simulate_trajectory(
                    n_isolated, n_stick, n_hinge, rng, length, sample_freq,
                    **kwargs
                )
                cfgs.append(cfg); locs.append(loc); vels.append(vel)
                qqs.append(qq); charges.append(q)
        sfx = f"{split}_charged{name}"
        np.save(os.path.join(path, f"loc_{sfx}.npy"), np.array(locs))
        np.save(os.path.join(path, f"vel_{sfx}.npy"), np.array(vels))
        np.save(os.path.join(path, f"edges_{sfx}.npy"), np.array(qqs))
        np.save(os.path.join(path, f"charges_{sfx}.npy"), np.array(charges))
        with open(os.path.join(path, f"cfg_{sfx}.pkl"), "wb") as f:
            pickle.dump(cfgs, f)
    return name
