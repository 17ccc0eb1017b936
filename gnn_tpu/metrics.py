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
def plot_roc(fpr, tpr, roc_auc, savedir, *, line_width=1.5, cmap="Set2"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    color_map = matplotlib.colormaps[cmap]
    plt.figure()
    for i, key in enumerate(fpr):
        lw = line_width + 1 if key in ("macro", "micro") else line_width
        plt.plot(fpr[key], tpr[key], color=color_map(i), lw=lw,
                 label=f"ROC curve - class {key} (area = {roc_auc[key]:0.2f})")
    plt.plot([0, 1], [0, 1], color="navy", lw=line_width, linestyle="--")
    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.05])
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("ROC - Receiver Operating Characteristic")
    plt.legend(loc="lower right")
    if savedir:
        plt.savefig(savedir)
    plt.close()


def plot_prisofs(recall, precision, avg_precision, savedir, *, line_width=1.5, cmap="Set2"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    color_map = matplotlib.colormaps[cmap]
    plt.figure()
    lines, labels = [], []
    for f_score in np.linspace(0.2, 0.8, num=4):
        x = np.linspace(0.01, 1)
        y = f_score * x / (2 * x - f_score)
        l, = plt.plot(x[y >= 0], y[y >= 0], color="gray", alpha=0.2)
        plt.annotate(f"f1={f_score:0.1f}", xy=(0.9, y[45] + 0.02))
    lines.append(l)
    labels.append("iso-f1 curves")
    for i, key in enumerate(precision):
        l, = plt.plot(recall[key], precision[key], color=color_map(i), lw=line_width)
        lines.append(l)
        labels.append(f"Precision-recall for class {i} (area = {avg_precision[i]:0.2f})")
    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.05])
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("Precision-Recall curve to multi-class with iso-Fscore curves")
    plt.legend(lines, labels, loc="lower center")
    if savedir:
        plt.savefig(savedir)
    plt.close()


def ROC(y_test, y_score, savedir="", macro_and_micro: bool = False, pos_label=0):
    """ROC curves per class + optional micro/macro averages (GNN_metrics.py:108-138)."""
    y_test = np.asarray(y_test)
    y_score = np.asarray(y_score)
    n_classes = y_test.shape[1]
    fpr, tpr, roc_auc = {}, {}, {}
    for i in range(n_classes):
        fpr[i], tpr[i], _ = mt.roc_curve(y_test[:, i], y_score[:, i], pos_label=pos_label)
        roc_auc[i] = mt.auc(fpr[i], tpr[i])

    if macro_and_micro:
        yt, ys = y_test.ravel(), y_score.ravel()
        fpr["micro"], tpr["micro"], _ = mt.roc_curve(yt, ys, pos_label=pos_label)
        roc_auc["micro"] = mt.auc(fpr["micro"], tpr["micro"])
        all_fpr = np.unique(np.concatenate([fpr[i] for i in range(n_classes)]))
        mean_tpr = np.zeros_like(all_fpr)
        for i in range(n_classes):
            mean_tpr += np.interp(all_fpr, fpr[i], tpr[i])
        mean_tpr /= n_classes
        fpr["macro"], tpr["macro"] = all_fpr, mean_tpr
        roc_auc["macro"] = mt.auc(all_fpr, mean_tpr)

    plot_roc(fpr, tpr, roc_auc, savedir)
    return roc_auc


def PRISOFS(targs, y_score, savedir="", pos_label=0):
    """Precision-Recall + iso-F1 curves (GNN_metrics.py:142-148)."""
    targs = np.asarray(targs)
    y_score = np.asarray(y_score)
    precision, recall, avg = {}, {}, {}
    for i in range(targs.shape[1]):
        precision[i], recall[i], _ = mt.precision_recall_curve(
            targs[:, i], y_score[:, i], pos_label=pos_label)
        avg[i] = mt.average_precision_score(targs[:, i], y_score[:, i], pos_label=pos_label)
    plot_prisofs(recall, precision, avg, savedir)
    return avg


# ------------------------------------------------------------------ registry
Metrics = {"Acc": mt.accuracy_score, "Bacc": mt.balanced_accuracy_score,
           "Js": mt.jaccard_score, "Ck": mt.cohen_kappa_score,
           "Prec": mt.precision_score, "Rec": mt.recall_score,
           "Fs": mt.f1_score, "Tpr": TPR, "Tnr": TNR, "Fpr": FPR, "Fnr": FNR,
           "Cl0": accuracy_per_class, "Cl1": accuracy_per_class}
