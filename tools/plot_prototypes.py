"""t-SNE visualization of DML embedding prototypes.

The explicit version of the reference's commented plotting block
(DeepLabV3Plus-Pytorch/test_embedding.py:291-324): stack the 16 fixed
one-hot class centers (magnitude 3; display labels 0-12 keep their id,
13-15 shift by +3 to leave room for the novel ids) with per-class
embedding samples loaded from a prototype JSON, run 2-D t-SNE, min-max
normalize, and save a tab20-colored scatter.

Input JSON formats accepted:
  * flat list of vectors (one class — the `prototype_car_5_shot.json`
    format written by cli/extract_prototypes.py): all points get one label;
  * list of per-class lists of vectors (the `prototype_ood.json` format
    the reference block iterates `prototype[i] for i in range(19)`).

Usage:
  python tools/plot_prototypes.py prototype_car_5_shot.json \
      --out imgs/tSNE_.jpg [--dim 16] [--magnitude 3] [--perplexity 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_center_rows(dim: int = 16, magnitude: float = 3.0):
    """The fixed one-hot prototypes and their display labels
    (test_embedding.py:292-300: label i for i<=12, i+3 above)."""
    data = np.eye(dim) * magnitude
    labels = np.array([i if i <= 12 else i + 3 for i in range(dim)],
                      np.int64)
    return data, labels


def load_prototype_points(path: str, dim: int):
    """Flat list-of-vectors (one class) or list of per-class lists."""
    with open(path) as f:
        tree = json.load(f)
    if not tree:
        raise ValueError(f"{path}: no prototypes")
    first = np.asarray(tree[0], np.float64)
    data, labels = [], []
    if first.ndim == 1 and len(first) == dim:  # flat: one novel class
        for vec in tree:
            data.append(np.asarray(vec, np.float64))
            labels.append(dim)  # the novel id
    else:  # per-class lists (reference's prototype_ood.json layout)
        for cl, vecs in enumerate(tree):
            arr = np.asarray(vecs, np.float64)
            if arr.size == 0:
                continue
            arr = arr.reshape(-1, dim)
            data.extend(arr)
            labels.extend([cl] * arr.shape[0])
    return np.asarray(data), np.asarray(labels, np.int64)


def plot_tsne(data, labels, out_path: str, perplexity: float = 30.0,
              seed: int = 0):
    from sklearn import manifold
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    perplexity = min(perplexity, max(1.0, (data.shape[0] - 1) / 3.0))
    tsne = manifold.TSNE(n_components=2, perplexity=perplexity,
                         random_state=seed, init="pca")
    x = tsne.fit_transform(data)
    x_min, x_max = x.min(0), x.max(0)
    x_norm = (x - x_min) / np.maximum(x_max - x_min, 1e-12)

    plt.figure()
    plt.scatter(x_norm[:, 0], x_norm[:, 1], c=labels, cmap=plt.cm.tab20,
                vmin=0, vmax=19)
    plt.xticks([])
    plt.yticks([])
    plt.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    plt.savefig(out_path, bbox_inches="tight", dpi=600, pad_inches=0)
    plt.close()
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prototype_json")
    ap.add_argument("--out", default="imgs/tSNE_.jpg")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--magnitude", type=float, default=3.0)
    ap.add_argument("--perplexity", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    centers, center_labels = build_center_rows(args.dim, args.magnitude)
    points, point_labels = load_prototype_points(args.prototype_json,
                                                 args.dim)
    data = np.vstack([centers, points])
    labels = np.concatenate([center_labels, point_labels])
    out = plot_tsne(data, labels, args.out, args.perplexity, args.seed)
    print(f"wrote {out} ({data.shape[0]} points)")
    return out


if __name__ == "__main__":
    main()
