"""Data-pipeline throughput: native C++ loader vs PIL host transforms.

Writes N synthetic MRI-like slice PNGs, then measures images/sec for
(a) PIL decode + torchvision-equivalent host augmentation chain,
(b) native decode+resize (plain canvases), and
(c) native decode+affine-warp+blur (full augmentation).

Run: python tools/bench_data.py [N]
"""
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrclip_tpu.data import CsvDataset  # noqa: E402
from mrclip_tpu.native import augment_batch, augment_matrices, load_batch, native_available  # noqa: E402
from mrclip_tpu.transforms import PreprocessCfg, TrainTransform  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    d = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (256, 256), np.uint8)
        p = os.path.join(d, f"s{i}.png")
        Image.fromarray(arr, "L").save(p)
        paths.append(p)

    # (a) PIL host chain (per-sample, like torch DataLoader workers)
    t = TrainTransform(PreprocessCfg(size=224))
    for p in paths[:8]:
        t(Image.open(p))  # warm
    t0 = time.perf_counter()
    for p in paths:
        t(Image.open(p))
    pil_rate = n / (time.perf_counter() - t0)
    print(f"PIL host augmentation chain : {pil_rate:7.0f} img/s")

    if not native_available():
        print("native library not built (make -C native); skipping native paths")
        return

    # (b) native decode + resize
    load_batch(paths[:8], (224, 224))  # warm
    t0 = time.perf_counter()
    load_batch(paths, (224, 224))
    print(f"native decode+resize        : {n / (time.perf_counter() - t0):7.0f} img/s")

    # (c) native full augmentation
    ms = augment_matrices(rng, n)
    sig = rng.uniform(0.1, 2.0, n).astype(np.float32)
    augment_batch(paths[:8], (224, 224), ms[:8], sig[:8])  # warm
    t0 = time.perf_counter()
    augment_batch(paths, (224, 224), ms, sig)
    print(f"native decode+warp+blur     : {n / (time.perf_counter() - t0):7.0f} img/s")
    print(f"(host cores: {os.cpu_count()}; native scales ~linearly with cores)")


if __name__ == "__main__":
    main()
