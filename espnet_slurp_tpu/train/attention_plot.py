"""Attention harvesting for diagnostics.

Parity target: reference espnet2/main_funcs/calculate_all_attentions.py +
Trainer.plot_attention (trainer.py:774-859): collect attention matrices for
a validation batch and dump heat-map PNGs per epoch.

Modules `sow` their attention weights into the 'intermediates' collection
(models/attention.py), so harvesting is one apply with mutable
intermediates — no hooks.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np


def calculate_all_attentions(model, params, batch: Dict) -> Dict[str, np.ndarray]:
    """Run a forward pass capturing every sown attention tensor.

    Returns {module_path: [B, H, Tq, Tk] array}.
    """
    _, state = model.apply(
        {"params": params}, **batch, mutable=["intermediates"])
    out = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}[{i}]")
        else:
            out[prefix] = np.asarray(tree)

    walk(state.get("intermediates", {}), "")
    return {k.replace("/attn[0]", ""): v for k, v in out.items()
            if "attn" in k}


def plot_attentions(attentions: Dict[str, np.ndarray], out_dir: str | Path,
                    example: int = 0) -> list:
    """Dump heat-map PNGs (one per module/head) if matplotlib is available;
    otherwise save .npy arrays. Returns written paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        have_mpl = True
    except Exception:
        have_mpl = False
    for name, att in attentions.items():
        safe = name.strip("/").replace("/", ".")
        if att.ndim == 4:
            a = att[example]  # [H, Tq, Tk]
        elif att.ndim == 3:
            a = att[None][0]
        else:
            continue
        if have_mpl:
            h = a.shape[0]
            fig, axes = plt.subplots(1, h, figsize=(3 * h, 3))
            if h == 1:
                axes = [axes]
            for i, ax in enumerate(axes):
                ax.imshow(a[i], aspect="auto", origin="lower")
                ax.set_title(f"head {i}")
            p = out / f"{safe}.png"
            fig.savefig(p)
            plt.close(fig)
        else:
            p = out / f"{safe}.npy"
            np.save(p, a)
        written.append(p)
    return written
