"""Assemble docs/parity/PARITY.md from the parity-run JSON logs.

Reads [best, log] pairs (reference JSON-log format, utils/train.py:220-223)
for each completed parity experiment and writes a markdown summary with
converged bests and equal-epoch trajectory checkpoints.
"""

from __future__ import annotations

import json
import os

PAIRS = [
    ("N-body 5_0_0 (round 2)", "docs/parity/parity_jax.json",
     "docs/parity/parity_torch.json"),
    ("N-body 100_0_0 (reference headline config, round 4)",
     "docs/parity/parity100_jax.json", "docs/parity/parity100_torch.json"),
    ("Water-3D synthetic h5 (round 4)",
     "docs/parity/parity_sim_jax.json", "docs/parity/parity_sim_torch.json"),
]


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        best, log = json.load(f)
    return best, log


def fmt_best(b):
    return (f"best test MSE **{b['loss_test']:.6f}** (valid "
            f"{b['loss_valid']:.6f}, epoch {b['epoch_index']}, "
            f"{b.get('time_cost', 0):.0f}s)")


def traj(log, epochs):
    out = []
    for e in epochs:
        if e in log.get("epochs", []):
            i = log["epochs"].index(e)
            out.append((e, log["loss"][i]))
    return out


def main():
    lines = [
        "# Converged-MSE parity vs the live PyTorch reference",
        "",
        "Each experiment trains OUR JAX/TPU pipeline and the reference's own",
        "PyTorch code (via `utils/torch_ref.py` shims) on identical data and",
        "hyperparameters; the criterion is converged test MSE within noise",
        "(BASELINE.md).  Raw `[best, log]` JSONs sit beside this file.",
        "",
    ]
    for title, jax_p, torch_p in PAIRS:
        j, t = load(jax_p), load(torch_p)
        lines.append(f"## {title}")
        lines.append("")
        if j is None or t is None:
            lines.append("*(run incomplete — JSONs not yet landed)*")
            lines.append("")
            continue
        (jb, jl), (tb, tl) = j, t
        lines.append(f"- ours (JAX/TPU): {fmt_best(jb)}")
        lines.append(f"- torch reference (CPU): {fmt_best(tb)}")
        ratio = jb["loss_test"] / max(tb["loss_test"], 1e-12)
        lines.append(f"- ratio ours/torch: **{ratio:.3f}**")
        common = sorted(set(jl.get("epochs", [])) & set(tl.get("epochs", [])))
        if common:
            marks = [e for e in common
                     if e in {common[len(common) // 4],
                              common[len(common) // 2],
                              common[-1]}]
            rows = ["| epoch | ours | torch |", "|---|---|---|"]
            for e in marks:
                je = dict(traj(jl, [e]))[e]
                te = dict(traj(tl, [e]))[e]
                rows.append(f"| {e} | {je:.6f} | {te:.6f} |")
            lines.append("")
            lines.append("Equal-epoch test-MSE trajectory:")
            lines.append("")
            lines.extend(rows)
        lines.append("")
    os.makedirs("docs/parity", exist_ok=True)
    with open("docs/parity/PARITY.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
