"""Generate golden CLIP activations from the reference PyTorch model (run once).

Oracle: `/root/reference/src/open_clip/model.py` CLIP with a tiny config.
Saves the torch state dict + random inputs + reference outputs to
`tests/golden_clip.npz` for the numerics-parity test (BASELINE.md north star:
numerically matching embeddings).
"""

import importlib.machinery
import os
import sys
import types

import numpy as np


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Stub out deps the reference imports but this image lacks."""
    import torch.nn as nn

    if "ftfy" not in sys.modules:
        _stub("ftfy", fix_text=lambda x: x)
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        ops = _stub("torchvision.ops")
        misc = _stub("torchvision.ops.misc", FrozenBatchNorm2d=nn.BatchNorm2d)
        ops.misc = misc
        tv.ops = ops
        # transform.py wants torchvision.transforms.* — not needed for model
        tf = _stub(
            "torchvision.transforms",
            InterpolationMode=types.SimpleNamespace(
                BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest"),
        )
        def _tf_getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return object  # any transform class -> dummy

        tf.__getattr__ = _tf_getattr
        tf.functional = _stub("torchvision.transforms.functional")
        sys.modules["torchvision.transforms.functional"] = tf.functional
        tv.transforms = tf
    if "timm" not in sys.modules:
        _stub("timm")


def main():
    install_stubs()
    import torch

    sys.path.insert(0, "/root/reference/src")
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg

    torch.manual_seed(0)
    vision_cfg = CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=16, image_size=32)
    text_cfg = CLIPTextCfg(context_length=16, vocab_size=1000, width=64, heads=2, layers=2)
    model = CLIP(embed_dim=32, vision_cfg=vision_cfg, text_cfg=text_cfg, quick_gelu=False)
    model.eval()

    rng = np.random.RandomState(42)
    images = rng.randn(4, 3, 32, 32).astype(np.float32)
    tokens = rng.randint(1, 500, (4, 16)).astype(np.int64)
    tokens[:, 0] = 1
    for i in range(4):
        tokens[i, rng.randint(4, 16)] = 999  # EOT: the max token id (argmax pool)

    with torch.no_grad():
        img_f = model.encode_image(torch.from_numpy(images), normalize=True)
        txt_f = model.encode_text(torch.from_numpy(tokens), normalize=True)
        logits_i, logits_t = model.get_logits(torch.from_numpy(images), torch.from_numpy(tokens))

    out = {
        "images": images,
        "tokens": tokens.astype(np.int32),
        "image_features": img_f.numpy(),
        "text_features": txt_f.numpy(),
        "logits_per_image": logits_i.numpy(),
    }
    for k, v in model.state_dict().items():
        out[f"sd::{k}"] = v.numpy()

    path = os.path.join(os.path.dirname(__file__), "golden_clip.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
