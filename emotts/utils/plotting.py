"""Plotting / qualitative-artifact helpers.

Same artifact set as the reference's observability layer (SURVEY.md §5):
mel-spectrogram images (rank_model/util.py:10-48), pred-vs-GT mel grids
(fastspeech2/util.py:57-87), and t-SNE scatter of pooled intensity features
colored by emotion and marked by speaker (rank_model/train.py:128-171).
Matplotlib is imported lazily with the Agg backend so headless runs work.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_melspectrogram(mel: np.ndarray, save_path: str, title: str = "Mel") -> None:
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(mel, aspect="auto", origin="lower", interpolation="none")
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def plot_mel_grid(
    pred: np.ndarray,  # (N, T, n_mels)
    target: np.ndarray,
    save_path: str,
    max_each: int = 8,
) -> None:
    """4×4 grid: predictions (top half) vs ground truth (bottom half)."""
    plt = _plt()
    pred = pred[:max_each]
    target = target[:max_each]
    mels = np.concatenate([pred, target], axis=0)
    n = len(mels)
    rows = max(1, (n + 3) // 4)
    fig, axes = plt.subplots(rows, 4, figsize=(16, 2.5 * rows), squeeze=False)
    for i, ax in enumerate(axes.flatten()):
        if i >= n:
            ax.axis("off")
            continue
        ax.imshow(mels[i].T, aspect="auto", origin="lower", interpolation="none")
        label = f"Pred {i + 1}" if i < len(pred) else f"GT {i - len(pred) + 1}"
        ax.text(0.95, 0.95, label, ha="right", va="top", transform=ax.transAxes,
                fontsize=11, fontweight="bold",
                color="tab:blue" if i < len(pred) else "tab:red")
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def plot_tsne(
    features: np.ndarray,  # (N, D) pooled intensity features
    emotions: np.ndarray,  # (N,) int labels
    speakers: np.ndarray,  # (N,) int labels
    alphas: Optional[np.ndarray],
    emotion_names: Sequence[str],
    speaker_names: Sequence[str],
    colors: Sequence[str],
    markers: Sequence[str],
    save_path: str,
) -> bool:
    """t-SNE scatter of intensity features; returns False if sklearn is
    unavailable or there are too few points."""
    if len(features) < 8:
        return False
    try:
        from sklearn.manifold import TSNE
    except Exception:
        return False
    plt = _plt()
    perplexity = min(30.0, max(2.0, len(features) / 4 - 1))
    pts = TSNE(n_components=2, perplexity=perplexity, init="random").fit_transform(
        features
    )
    if alphas is None:
        alphas = np.ones(len(features))
    fig, ax = plt.subplots(figsize=(10, 10))
    for e in range(len(emotion_names)):
        for s in range(len(speaker_names)):
            mask = (emotions == e) & (speakers == s)
            if not mask.any():
                continue
            ax.scatter(
                pts[mask, 0], pts[mask, 1],
                c=colors[e % len(colors)], marker=markers[s % len(markers)],
                s=15, alpha=np.minimum(1.0, alphas[mask] + 0.1),
            )
    from matplotlib.lines import Line2D
    import matplotlib.patches as mpatches

    handles_e = [
        mpatches.Patch(color=colors[i % len(colors)], label=emotion_names[i])
        for i in range(len(emotion_names))
    ]
    handles_s = [
        Line2D([], [], color="black", marker=markers[i % len(markers)],
               linestyle="None", label=speaker_names[i])
        for i in range(len(speaker_names))
    ]
    leg1 = ax.legend(handles=handles_e, title="Emotion", loc="upper left",
                     bbox_to_anchor=(1.02, 1))
    ax.add_artist(leg1)
    ax.legend(handles=handles_s, title="Speaker", loc="upper left",
              bbox_to_anchor=(1.02, 0.6))
    ax.set_title("t-SNE of pooled intensity features")
    ax.grid(True, linestyle="--", alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return True


def plot_features(
    mel: np.ndarray,  # (n_mels, T)
    pitch: np.ndarray,  # (T,) z-normalized
    energy: np.ndarray,  # (T,) z-normalized
    stats: dict,  # {'pitch': [min,max,mean,std], 'energy': [...]}
    save_path: str,
) -> None:
    """Mel with denormalized pitch/energy curves overlaid (the reference's
    feature-inspection plot, rank_model/util.py:51-99)."""
    plt = _plt()
    p_min, p_max, p_mean, p_std = stats["pitch"]
    e_min, e_max, e_mean, e_std = stats["energy"]
    pitch_hz = pitch * p_std + p_mean
    energy_v = energy * e_std + e_mean

    fig, ax = plt.subplots(figsize=(10, 3))
    ax.imshow(mel, aspect="auto", origin="lower", interpolation="none")
    ax.set_xlabel("Time (frames)")
    ax.set_title("Mel + pitch + energy")

    ax1 = ax.twinx()
    ax1.plot(pitch_hz, color="tomato", linewidth=2, label="pitch")
    ax1.set_ylim(p_min * p_std + p_mean, p_max * p_std + p_mean)
    ax1.set_ylabel("Pitch (Hz)", color="tomato")

    ax2 = ax.twinx()
    ax2.spines["right"].set_position(("axes", 1.08))
    ax2.plot(energy_v, color="darkviolet", linewidth=2, label="energy")
    ax2.set_ylim(e_min * e_std + e_mean, e_max * e_std + e_mean)
    ax2.set_ylabel("Energy", color="darkviolet")

    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def plot_intensity_sweep(report: dict, save_path: str) -> None:
    """Rank score vs commanded intensity level, per (speaker, emotion) cell.

    The measurable upgrade of the reference's headline result artifact
    (readme.md:102-115 shows a t-SNE of the learned representations;
    assets/intensities.png): here every line is one speaker x emotion cell
    of the synthesized sweep from emotts/eval/intensity_eval.py, and a
    monotonically rising line means the commanded level audibly moved the
    synthesized audio along the learned intensity axis.  Non-monotone
    cells are drawn dashed.

    ``report`` is the intensity-efficacy report dict (or its saved JSON):
    needs ``levels`` and ``by_cell[cell]["score_mean_per_level"]``.
    """
    plt = _plt()
    first = next(iter(report["by_cell"].values()), None)
    levels = report.get("levels") or list(
        range(len(first["score_mean_per_level"]) if first else 0)
    )
    cells = report["by_cell"]
    speakers = sorted({c.split("/")[0] for c in cells})
    emotions = sorted({c.split("/")[1] for c in cells})
    n = max(1, len(speakers))
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 3.4), sharey=True,
                             squeeze=False)
    seen_labels: dict = {}  # emotion -> handle, across ALL panels
    for si, spk in enumerate(speakers):
        ax = axes[0][si]
        for ei, emo in enumerate(emotions):
            cell = cells.get(f"{spk}/{emo}")
            if cell is None:
                continue
            color = DEFAULT_COLORS[ei % len(DEFAULT_COLORS)]
            style = "-" if cell.get("monotone_strict", True) else "--"
            # a degenerate combo (zero synthesized frames at some level)
            # can leave fewer scores than configured levels — plot the
            # surviving scores at their TRUE level positions (the report's
            # per-cell ``levels``; a missing level need not be the trailing
            # one) instead of crashing the campaign's final leg
            ys = cell["score_mean_per_level"]
            xs = cell.get("levels", levels[: len(ys)])
            n_pts = min(len(xs), len(ys))
            (line,) = ax.plot(xs[:n_pts], ys[:n_pts], style,
                              marker="o", markersize=4, color=color)
            seen_labels.setdefault(emo, line)
        ax.set_title(spk, fontsize=10)
        ax.set_xlabel("intensity level")
        ax.set_xticks(levels)
        if si == 0:
            ax.set_ylabel("rank score of synthesized audio")
    if seen_labels:
        fig.legend(seen_labels.values(), seen_labels.keys(),
                   loc="upper center", ncol=len(seen_labels),
                   frameon=False, bbox_to_anchor=(0.5, 1.02))
    acc = report.get("pairwise_order_accuracy")
    verdict = report.get("verdict", "")
    sub = f"pairwise order accuracy {acc:.3f}" if acc is not None else ""
    fig.suptitle(f"Intensity-control efficacy ({verdict}) — {sub}",
                 y=1.12, fontsize=11)
    fig.tight_layout()
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


DEFAULT_COLORS = ["#7C00FE", "#F9E400", "#FFAF00", "#F5004F", "#00B2A9"]
DEFAULT_MARKERS = ["o", "^", "s", "d"]
