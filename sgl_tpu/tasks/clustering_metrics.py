"""Clustering metrics (reference ``sgl/tasks/clustering_metrics.py:11-70``).

Accuracy uses optimal cluster-to-label matching via
``scipy.optimize.linear_sum_assignment`` (Hungarian) instead of the
``munkres`` package; NMI/ARI via sklearn.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment
from sklearn import metrics


class clustering_metrics:  # noqa: N801 — reference-compatible name
    def __init__(self, true_label, predict_label):
        self.true_label = np.asarray(true_label)
        self.pred_label = np.asarray(predict_label)

    def clusteringAcc(self):  # noqa: N802
        l1 = np.unique(self.true_label)
        l2 = np.unique(self.pred_label)
        if len(l1) != len(l2):
            return 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
        cost = np.zeros((len(l1), len(l2)), dtype=np.int64)
        for i, c1 in enumerate(l1):
            for j, c2 in enumerate(l2):
                cost[i, j] = int(
                    np.sum((self.true_label == c1) & (self.pred_label == c2))
                )
        row, col = linear_sum_assignment(-cost)
        new_predict = np.zeros_like(self.pred_label)
        for i, j in zip(row, col):
            new_predict[self.pred_label == l2[j]] = l1[i]
        acc = metrics.accuracy_score(self.true_label, new_predict)
        f1_macro = metrics.f1_score(self.true_label, new_predict, average="macro")
        p_macro = metrics.precision_score(
            self.true_label, new_predict, average="macro", zero_division=0
        )
        r_macro = metrics.recall_score(
            self.true_label, new_predict, average="macro", zero_division=0
        )
        f1_micro = metrics.f1_score(self.true_label, new_predict, average="micro")
        p_micro = metrics.precision_score(
            self.true_label, new_predict, average="micro", zero_division=0
        )
        r_micro = metrics.recall_score(
            self.true_label, new_predict, average="micro", zero_division=0
        )
        return acc, f1_macro, p_macro, r_macro, f1_micro, p_micro, r_micro

    def evaluationClusterModelFromLabel(self):  # noqa: N802
        nmi = metrics.normalized_mutual_info_score(self.true_label, self.pred_label)
        adjscore = metrics.adjusted_rand_score(self.true_label, self.pred_label)
        acc = self.clusteringAcc()[0]
        return acc, nmi, adjscore

    @staticmethod
    def plot(X, fig, col, size, true_labels):
        """Scatter 2-D points colored by true label (reference
        ``clustering_metrics.py:68-71``)."""
        ax = fig.add_subplot(1, 1, 1)
        true_labels = np.asarray(true_labels)
        for i, c in enumerate(col[: int(true_labels.max()) + 1]):
            pts = X[true_labels == i]
            ax.scatter(pts[:, 0], pts[:, 1], lw=0, s=size, c=c)

    def plotClusters(self, hidden_emb, true_labels, path="plot.png"):  # noqa: N802
        """t-SNE 2-D projection of embeddings, colored by true label, saved
        to ``path`` (reference ``clustering_metrics.py:72-86``; its tqdm
        progress handle is dropped — plain logging instead).  Optional
        dependency: needs matplotlib (headless Agg backend)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE

        hidden_emb = np.asarray(hidden_emb)
        tsne = TSNE(n_components=2, perplexity=min(30.0, max(2.0, hidden_emb.shape[0] / 4)))
        x_tsne = tsne.fit_transform(hidden_emb)
        fig = plt.figure()
        self.plot(
            x_tsne,
            fig,
            ["red", "green", "blue", "brown", "purple", "yellow", "pink", "orange"],
            40,
            true_labels,
        )
        plt.axis("off")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
