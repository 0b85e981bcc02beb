"""Full-scale ViT-B/16 activation parity vs the reference PyTorch model.

Builds the reference CLIP (torch, random init), imports its state dict, and
compares normalized embeddings on random inputs. Last measured:
img maxdiff=1.04e-07, txt maxdiff=2.03e-07 (fp32).

Run: python tools/full_scale_parity.py  (needs ~6 GB RAM, several minutes)
"""
import importlib.machinery
import sys
import types

import numpy as np


def stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def main():
    import torch.nn as nn

    stub("ftfy", fix_text=lambda x: x)
    tv = stub("torchvision")
    ops = stub("torchvision.ops")
    ops.misc = stub("torchvision.ops.misc", FrozenBatchNorm2d=nn.BatchNorm2d)
    tv.ops = ops
    tf = stub("torchvision.transforms", InterpolationMode=types.SimpleNamespace(
        BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest"))

    def _g(n):
        if n.startswith("__"):
            raise AttributeError(n)
        return object

    tf.__getattr__ = _g
    tf.functional = stub("torchvision.transforms.functional")
    tv.transforms = tf
    stub("timm")

    sys.path.insert(0, "/root/reference/src")
    import torch
    from open_clip.model import CLIP as RefCLIP, CLIPTextCfg as RT, CLIPVisionCfg as RV

    torch.manual_seed(0)
    ref = RefCLIP(
        embed_dim=512,
        vision_cfg=RV(layers=12, width=768, head_width=64, patch_size=16, image_size=224),
        text_cfg=RT(context_length=98, vocab_size=49408, width=512, heads=8, layers=12),
    )
    ref.eval()
    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 224, 224).astype(np.float32)
    tokens = rng.randint(1, 49000, (2, 98)).astype(np.int64)
    tokens[:, 0] = 1
    for i in range(2):
        tokens[i, rng.randint(50, 98)] = 49407
    with torch.no_grad():
        ri = ref.encode_image(torch.from_numpy(images), normalize=True).numpy()
        rt = ref.encode_text(torch.from_numpy(tokens), normalize=True).numpy()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    del ref

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from mrclip_tpu.checkpoint import import_torch_state_dict
    from mrclip_tpu.factory import create_model

    model, _ = create_model("ViT-B-16", init_params=False)
    params = import_torch_state_dict(sd, scan_layers=False)
    out = model.apply(
        {"params": params},
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(tokens.astype(np.int32)),
    )
    di = np.abs(np.asarray(out["image_features"]) - ri).max()
    dt = np.abs(np.asarray(out["text_features"]) - rt).max()
    print(f"full-scale ViT-B/16 parity: img maxdiff={di:.2e} txt maxdiff={dt:.2e}")
    assert di < 5e-5 and dt < 5e-5
    print("FULL-SCALE PARITY OK")


if __name__ == "__main__":
    main()
