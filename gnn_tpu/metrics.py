"""Metric registry + ROC / Precision-Recall curve reporting.

Mirrors the reference metrics surface (GNN/GNN_metrics.py:19-155): the same 13
named metrics over sklearn, TPR/TNR/FPR/FNR wrappers, per-class accuracy, and
ROC / PR-with-iso-F1 matplotlib exports. All of this is host-side (device
outputs are pulled once per evaluation); matplotlib import is deferred so
headless training never touches it.
"""

from __future__ import annotations

import numpy as np
from sklearn import metrics as mt


# --------------------------------------------------------------------- rates
def TPR(y_true, y_pred):
    return mt.recall_score(y_true=y_true, y_pred=y_pred)


def TNR(y_true, y_pred):
    return 2 * mt.balanced_accuracy_score(y_true=y_true, y_pred=y_pred) \
        - mt.recall_score(y_true=y_true, y_pred=y_pred)


def FPR(y_true, y_pred):
    return 1 - TNR(y_true=y_true, y_pred=y_pred)


def FNR(y_true, y_pred):
    return 1 - TPR(y_true=y_true, y_pred=y_pred)


def accuracy_per_class(y_true, y_pred, class_label: int = None):
    mat = mt.confusion_matrix(y_true=y_true, y_pred=y_pred)
    class_accuracy = np.diag(mat) / np.sum(mat, axis=1)
    if class_label is not None:
        class_accuracy = class_accuracy[class_label]
    return class_accuracy


# --------------------------------------------------------------------- plots
# Curve figures are assembled from (label, x, y, lw) records by one renderer,
# so both exports share styling. Reproduces the ARTIFACTS of
# GNN_metrics.py:48-104 (per-class ROC / PR curves saved to a dir); the
# rendering code is this repo's own.
def _render_curves(curves, *, xlabel, ylabel, title, legend_loc, savedir,
                   underlay=None, cmap="Set2"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    if underlay is not None:
        underlay(ax)
    palette = matplotlib.colormaps[cmap]
    for i, (label, x, y, lw) in enumerate(curves):
        ax.plot(x, y, color=palette(i), lw=lw, label=label)
    ax.set(xlim=(0.0, 1.0), ylim=(0.0, 1.05), xlabel=xlabel, ylabel=ylabel,
           title=title)
    ax.legend(loc=legend_loc, fontsize="small")
    if savedir:
        fig.savefig(savedir)
    plt.close(fig)


def plot_roc(fpr, tpr, roc_auc, savedir, *, line_width=1.5, cmap="Set2"):
    curves = [(f"ROC curve - class {k} (area = {roc_auc[k]:0.2f})",
               fpr[k], tpr[k],
               line_width + (1 if isinstance(k, str) else 0))
              for k in fpr]

    def chance_diagonal(ax):
        ax.plot([0, 1], [0, 1], color="navy", lw=line_width, ls="--")

    _render_curves(curves, xlabel="False Positive Rate",
                   ylabel="True Positive Rate",
                   title="ROC - Receiver Operating Characteristic",
                   legend_loc="lower right", savedir=savedir,
                   underlay=chance_diagonal, cmap=cmap)


def plot_prisofs(recall, precision, avg_precision, savedir, *, line_width=1.5,
                 cmap="Set2"):
    curves = [(f"Precision-recall for class {k} (area = {avg_precision[k]:0.2f})",
               recall[k], precision[k], line_width) for k in precision]

    def iso_f1_family(ax):
        # p = f·r / (2r − f): precision giving F1 == f at recall r
        r = np.linspace(0.01, 1.0, 200)
        for f in (0.2, 0.4, 0.6, 0.8):
            p = f * r / (2.0 * r - f)
            ok = (2.0 * r - f > 0) & (p <= 1.05)
            ax.plot(r[ok], p[ok], color="gray", alpha=0.25, lw=1.0)
            ax.annotate(f"f1={f:0.1f}", xy=(0.9, f / (2 - f) + 0.02),
                        color="gray", fontsize="x-small")

    _render_curves(curves, xlabel="Recall", ylabel="Precision",
                   title="Precision-Recall curves with iso-F1 contours",
                   legend_loc="lower center", savedir=savedir,
                   underlay=iso_f1_family, cmap=cmap)


def _binary_roc(y_col, score_col, pos_label):
    fpr, tpr, _ = mt.roc_curve(y_col, score_col, pos_label=pos_label)
    return fpr, tpr, mt.auc(fpr, tpr)


def ROC(y_test, y_score, savedir="", macro_and_micro: bool = False, pos_label=0):
    """Per-class ROC curves + AUCs, optional micro/macro averages — the
    reporting surface of GNN_metrics.py:108-138. Returns {class: auc}."""
    y_test, y_score = np.asarray(y_test), np.asarray(y_score)
    per_class = {c: _binary_roc(y_test[:, c], y_score[:, c], pos_label)
                 for c in range(y_test.shape[1])}
    fpr = {c: v[0] for c, v in per_class.items()}
    tpr = {c: v[1] for c, v in per_class.items()}
    auc = {c: v[2] for c, v in per_class.items()}

    if macro_and_micro:
        # micro: pool every (target, score) decision into one binary problem
        fpr["micro"], tpr["micro"], auc["micro"] = _binary_roc(
            y_test.ravel(), y_score.ravel(), pos_label)
        # macro: mean TPR over classes on the union grid of FPR breakpoints
        grid = np.unique(np.concatenate([v[0] for v in per_class.values()]))
        mean_tpr = np.mean([np.interp(grid, v[0], v[1])
                            for v in per_class.values()], axis=0)
        fpr["macro"], tpr["macro"] = grid, mean_tpr
        auc["macro"] = mt.auc(grid, mean_tpr)

    plot_roc(fpr, tpr, auc, savedir)
    return auc


def PRISOFS(targs, y_score, savedir="", pos_label=0):
    """Per-class Precision-Recall curves with iso-F1 contours — the reporting
    surface of GNN_metrics.py:142-148. Returns {class: average precision}."""
    targs, y_score = np.asarray(targs), np.asarray(y_score)
    precision, recall, avg = {}, {}, {}
    for c in range(targs.shape[1]):
        precision[c], recall[c], _ = mt.precision_recall_curve(
            targs[:, c], y_score[:, c], pos_label=pos_label)
        avg[c] = mt.average_precision_score(targs[:, c], y_score[:, c],
                                            pos_label=pos_label)
    plot_prisofs(recall, precision, avg, savedir)
    return avg


# ------------------------------------------------------------------ registry
Metrics = {"Acc": mt.accuracy_score, "Bacc": mt.balanced_accuracy_score,
           "Js": mt.jaccard_score, "Ck": mt.cohen_kappa_score,
           "Prec": mt.precision_score, "Rec": mt.recall_score,
           "Fs": mt.f1_score, "Tpr": TPR, "Tnr": TNR, "Fpr": FPR, "Fnr": FNR,
           "Cl0": accuracy_per_class, "Cl1": accuracy_per_class}
