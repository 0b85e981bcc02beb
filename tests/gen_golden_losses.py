"""Generate golden loss values from the reference torch implementations.

Oracles: `src/open_clip/loss.py` (multi_positive_cross_entropy_loss, ClipLoss,
SigLipLoss), `src/open_clip/loss copy.py` (distance variants, distances) and
`src/open_clip_train/example_sup_contrastive_loss.py` (SupCon spec). World
size 1 (single process); distributed parity is covered separately by the
8-device CPU-mesh equivalence tests.
"""

import importlib.util
import os
import sys

import numpy as np


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import types

    import torch

    # `loss copy.py` imports statsmodels' ECDF (only used by the commented-out
    # ECDF scaling path); stub it.
    if "statsmodels" not in sys.modules:
        for name in (
            "statsmodels",
            "statsmodels.distributions",
            "statsmodels.distributions.empirical_distribution",
        ):
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.util.spec_from_loader(name, None)
            sys.modules[name] = mod
        sys.modules["statsmodels.distributions.empirical_distribution"].ECDF = object

    loss_mod = _load("ref_loss", "/root/reference/src/open_clip/loss.py")
    loss_copy = _load("ref_loss_copy", "/root/reference/src/open_clip/loss copy.py")

    rng = np.random.RandomState(7)
    b, g, d = 8, 16, 32
    logits = rng.randn(b, g).astype(np.float32) * 3
    labels_row = rng.randint(0, 4, b)
    labels_col = rng.randint(0, 4, g)
    pos_mask = (labels_row[:, None] == labels_col[None, :]).astype(np.float32)
    te = rng.uniform(0.01, 0.2, b).astype(np.float32)
    tr = rng.uniform(0.5, 9.0, b).astype(np.float32)
    all_te = rng.uniform(0.01, 0.2, g).astype(np.float32)
    all_tr = rng.uniform(0.5, 9.0, g).astype(np.float32)

    t = torch.from_numpy
    out = {
        "logits": logits, "pos_mask": pos_mask,
        "labels_row": labels_row, "labels_col": labels_col,
        "te": te, "tr": tr, "all_te": all_te, "all_tr": all_tr,
    }

    out["mp_ce"] = loss_mod.multi_positive_cross_entropy_loss(t(logits), t(pos_mask)).numpy()
    dist = loss_copy.weighted_euclidean_distance_batchwise(t(te), t(tr), t(all_te), t(all_tr))
    out["weighted_euclidean"] = dist.numpy()
    out["mahalanobis"] = loss_copy.mahalanobis_distance_batchwise(
        t(te), t(tr), t(all_te), t(all_tr)
    ).numpy()
    out["mp_ce_dist"] = loss_copy.multi_positive_cross_entropy_loss_with_distance(
        t(logits), t(pos_mask), dist
    ).numpy()

    # ClipLoss / SigLipLoss single-process
    img = rng.randn(b, d).astype(np.float32)
    txt = rng.randn(b, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale, bias = np.array(20.0, np.float32), np.array(-10.0, np.float32)
    out["img"], out["txt"], out["scale"], out["bias"] = img, txt, scale, bias

    clip = loss_mod.ClipLoss()
    out["clip_loss"] = clip(t(img), t(txt), t(scale)).numpy()

    siglip = loss_mod.SigLipLoss(rank=0, world_size=1)
    out["siglip_loss"] = siglip(t(img), t(txt), t(scale), t(bias)).numpy()

    # MultiPositiveClipLoss end-to-end, world 1, delta 0.3
    mp = loss_mod.MultiPositiveClipLoss()
    out["mp_clip_loss"] = mp(
        t(img), t(txt), t(scale), delta=0.3, tokenized_texts=t(labels_row)
    ).detach().numpy()

    # SupCon example spec
    sup = _load(
        "ref_supcon_mod", "/root/reference/src/open_clip_train/example_sup_contrastive_loss.py"
    )
    feats = rng.randn(8, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    sup_labels = np.array([0, 1, 0, 1, 0, 2, 2, 0])
    out["sup_feats"], out["sup_labels"] = feats, sup_labels
    out["supcon"] = sup.supervised_contrastive_loss(t(feats), t(sup_labels)).numpy()

    path = os.path.join(os.path.dirname(__file__), "golden_losses.npz")
    np.savez(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
