"""Regression tests for the third round-3 review batch (train-step core).

- plain microbatch accumulation must AVERAGE the per-microbatch-mean
  gradients (each microbatch loss normalizes over its own rows, so the
  mean has the scale of one effective-batch mean-loss gradient; the
  cached-features branch sums UNSCALED like the reference loop,
  train.py:161-183, because each of its passes is already normalized
  over the full spliced batch);
- BN running statistics must update under BOTH accumulation modes
  (they were silently dropped whenever accum_freq > 1);
- create_train_state on a mesh must not eagerly allocate a throwaway
  unsharded optimizer state.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from mrclip_tpu.factory import create_loss, create_model
from mrclip_tpu.parallel import (
    build_train_step,
    create_train_state,
    make_loss_apply,
)


class Args:
    multipositiveloss = True
    delta = 0.5
    distance = visiononly = siglip = distill = False
    lam = None
    model = "ViT-B-32-mini"
    gather_with_grad = True


def _batch(n, seed=0, ctx=32, vocab=49408, size=64):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.rand(n, size, size, 3).astype(np.float32),
        "tokens": rng.randint(1, vocab, (n, ctx)).astype(np.int32),
        "labels": rng.randint(0, 4, (n,)).astype(np.int32),
    }


@pytest.mark.slow
def test_plain_accum_averages_microbatch_grads():
    """With SGD(lr=1, no momentum/wd) the param delta IS the gradient:
    one accum_freq=2 step from p0 must equal the MEAN of the two
    microbatches' gradients at p0 (each measured via its own accum=1
    step from a fresh p0). Each microbatch loss normalizes over its own
    rows, so the mean — not the sum — matches the gradient scale of a
    single effective-batch step and of the cached-features mode (whose
    reference-parity unscaled sum of full-batch-normalized passes equals
    one full-batch-mean gradient, train.py:161-183)."""
    model, variables = create_model("ViT-B-32-mini", rng_seed=0)
    tx = optax.sgd(1.0)
    loss_apply = make_loss_apply(create_loss(Args()))
    batch = _batch(16, seed=3)
    key = jax.random.key(0)

    def delta_of(step, b):
        state = create_train_state(variables, tx)
        p0 = state.params
        state2, _ = step(state, b, key)
        return jax.tree.map(lambda a, c: np.asarray(a) - np.asarray(c), p0, state2.params)

    step_acc = build_train_step(model, loss_apply, tx, accum_freq=2, donate=False)
    d_acc = delta_of(step_acc, batch)

    step_1 = build_train_step(model, loss_apply, tx, donate=False)
    micro0 = jax.tree.map(lambda x: x[:8], batch)
    micro1 = jax.tree.map(lambda x: x[8:], batch)
    # the accum scan folds rng per microbatch; this model takes no dropout
    # rngs, so the key difference is irrelevant here
    d0 = delta_of(step_1, micro0)
    d1 = delta_of(step_1, micro1)

    got = np.concatenate([x.ravel() for x in jax.tree.leaves(d_acc)])
    want = np.concatenate([
        (a.ravel() + b.ravel()) / 2.0
        for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(d1))
    ])
    # logit_scale clamp is applied per update; exclude nothing — the clamp
    # only binds at ln(100), far from init
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # guard against regressing to the sum: the sum is ~2x the mean
    assert not np.allclose(got, want * 2.0, rtol=1e-3, atol=1e-7)


@pytest.fixture(scope="module")
def rn_mini():
    from mrclip_tpu.factory import _MODEL_CONFIGS

    _MODEL_CONFIGS["RN50-mini-accum"] = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16, "head_width": 16},
        "text_cfg": {"context_length": 16, "vocab_size": 1000, "width": 32, "heads": 2, "layers": 2},
    }
    return create_model("RN50-mini-accum")


@pytest.mark.slow
@pytest.mark.parametrize("cached", [False, True])
def test_bn_stats_update_under_accum(rn_mini, cached):
    """BatchNorm running statistics must move on an accum_freq=2 step
    (they were dropped: new_mut discarded in the scan bodies)."""
    model, variables = rn_mini

    class A(Args):
        model = "RN50-mini-accum"

    tx = optax.sgd(1e-3)
    step = build_train_step(
        model, make_loss_apply(create_loss(A())), tx,
        accum_freq=2, cached_features_accum=cached, donate=False,
    )
    state = create_train_state(variables, tx)
    assert state.batch_stats is not None
    before = jax.tree.map(np.asarray, state.batch_stats)
    state2, metrics = step(state, _batch(8, seed=1, ctx=16, vocab=1000), jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    moved = max(
        float(np.abs(a - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state2.batch_stats))
    )
    assert moved > 0.0, "BN running stats did not update under accumulation"


def test_cls_attn_mask_matches_reference_torch_formula():
    """build_cls_attn_mask must reproduce the reference build_cls_mask +
    causal combination EXACTLY (transformer.py:784-806): the pad gate
    applies only to the CLS query row, and the key gate is the pad mask
    right-shifted by one (F.pad (1,0) left-pads the key dim)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from mrclip_tpu.models.text import build_cls_attn_mask

    pad_id = 0
    text = torch.tensor([[5, 7, 9, 0, 0], [3, 0, 4, 0, 0]])
    b, L = text.shape
    S = L + 1

    # literal reference construction
    cls_mask = (text != pad_id).unsqueeze(1)
    cls_mask = F.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=True)
    additive = torch.zeros(cls_mask.shape)
    additive.masked_fill_(~cls_mask, float("-inf"))
    causal = torch.full((S, S), float("-inf")).triu_(1)
    want = (causal[None] + additive).numpy()  # [B, S, S]

    got = np.asarray(build_cls_attn_mask(jnp.asarray(text.numpy()), pad_id))[:, 0]
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))
    np.testing.assert_allclose(
        np.where(np.isneginf(got), 0.0, got), np.where(np.isneginf(want), 0.0, want)
    )


def test_coca_generate_rejects_unknown_type():
    from mrclip_tpu.factory import create_model
    from mrclip_tpu.models.coca import generate

    model, variables = create_model("coca-mini")
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="generation_type"):
        generate(model, variables, imgs, seq_len=8, generation_type="topk")


def test_const_cooldown_converts_epochs_to_steps():
    """--epochs-cooldown is an EPOCH count; the schedule must cool down over
    epochs_cooldown * steps_per_epoch steps (reference main.py:450), not
    epochs_cooldown steps."""
    from mrclip_tpu.train.scheduler import create_scheduler

    class A:
        lr = 1.0
        lr_scheduler = "const-cooldown"
        warmup = 0
        epochs = 10
        epochs_cooldown = 4
        lr_cooldown_power = 1.0
        lr_cooldown_end = 0.0

    total_steps = 1000  # 100 steps/epoch
    sched = create_scheduler(A(), total_steps)
    assert float(sched(599)) == 1.0  # before the 400-step cooldown window
    # linear cooldown over the final 400 steps: step 700 is 25% in
    np.testing.assert_allclose(float(sched(700)), 0.75, rtol=1e-6)
    assert float(sched(999)) < 0.01  # (would be 1.0 with the old 4-step tail)


def test_tabular_dataset_respects_sep(tmp_path):
    """CsvTabularDataset must re-read the csv with the caller's separator;
    the default ',' misparsed tsv files into one giant categorical column."""
    from mrclip_tpu.data.csv_dataset import CsvTabularDataset

    p = tmp_path / "d.tsv"
    p.write_text(
        "filepath\ttitle\tlabel\tEcho Time\tRepetition Time\tScanner\n"
        "a.png\tcap a\t0\t0.09\t9.0\tGE\n"
        "b.png\tcap b\t1\t0.10\t8.0\tSiemens\n"
    )
    ds = CsvTabularDataset(str(p), sep="\t")
    # 2 numeric features + 1 categorical (Scanner) = 3 columns
    assert ds.tabular.shape == (2, 3)
    np.testing.assert_allclose(ds.tabular[:, 0], [0.09, 0.10])


def test_shard_worker_error_surfaces(tmp_path):
    """A worker thread that raises must not hang the multi-worker tar
    stream (the done sentinel used to be skipped on error) — the exception
    re-raises in the consumer."""
    import tarfile

    from mrclip_tpu.data.shards import ShardedTarDataset

    for s in range(2):
        with tarfile.open(tmp_path / f"{s}.tar", "w") as tf:
            for i in range(2):
                from PIL import Image
                import io

                buf = io.BytesIO()
                Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(buf, "png")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"s{s}_{i}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = b"caption"
                info = tarfile.TarInfo(f"s{s}_{i}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))

    def bad_transform(img):
        raise RuntimeError("bad transform")

    ds = ShardedTarDataset(
        f"{tmp_path}/0.tar::{tmp_path}/1.tar",
        transform=bad_transform,
        num_workers=2,
        shuffle=False,
    )
    with pytest.raises(RuntimeError, match="bad transform"):
        list(ds)


def test_train_loader_chunks_at_accum_times_batch(tmp_path):
    """Reference accum semantics: effective optimizer batch = accum_freq *
    batch_size. The fused TPU step consumes it as ONE loader batch, so the
    train loader must chunk at accum_freq * batch_size (and the schedule
    then ticks once per optimizer step — main.py no longer divides)."""
    from PIL import Image

    from mrclip_tpu.data import get_data

    rows = ["filepath,title,label"]
    for i in range(16):
        p = tmp_path / f"{i}.png"
        Image.fromarray(np.full((8, 8, 3), i * 15, np.uint8)).save(p)
        rows.append(f"{p},caption {i % 4},{i % 4}")
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(rows) + "\n")

    class A:
        train_data = str(csv)
        val_data = None
        dataset_type = "csv"
        batch_size = 4
        accum_freq = 2
        workers = 0
        csv_separator = ","
        distance = False
        rank = 0
        world_size = 1
        seed = 0

    def transform(img):
        return np.zeros((8, 8, 3), np.float32)

    data = get_data(A(), (transform, transform), tokenizer=lambda t: np.zeros((len(t), 4), np.int32))
    loader = data["train"].dataloader
    assert len(loader) == 2  # 16 samples / (4 * 2) = 2 optimizer steps
    batch = next(iter(loader))
    assert batch["images"].shape[0] == 8  # accum_freq * batch_size rows


def test_png_decode_rejects_hostile_headers(tmp_path):
    """The native decoder must refuse (not overflow) when the untrusted
    header declares more pixels than the output buffer holds, and must
    error (not emit black rows) when the zlib stream is short."""
    import io
    import struct
    import zlib

    from PIL import Image

    from mrclip_tpu.native import decode_png, native_available

    if not native_available():
        pytest.skip("native lib not built")

    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 7, np.uint8)).save(buf, "png")
    good = bytearray(buf.getvalue())
    assert decode_png(bytes(good), 3).shape == (8, 8, 3)

    # corrupt the IHDR dims to something enormous (recompute nothing — the
    # decoder must bail on capacity before touching pixel data)
    huge = bytearray(good)
    struct.pack_into(">II", huge, 16, 50000, 50000)
    assert decode_png(bytes(huge), 3) is None

    # short zlib stream: declare 8x8 but deflate only one row's bytes
    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    short_raw = b"\x00" + b"\x01" * 24  # 1 row of 8 RGB pixels
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(short_raw)) + chunk(b"IEND", b""))
    assert decode_png(png, 3) is None


def test_shard_worker_error_fails_fast(tmp_path):
    """A dead worker surfaces before the healthy workers drain the epoch —
    not only after ALL sentinels (an epoch of silent partial-data training)."""
    import io
    import tarfile
    import time

    from PIL import Image

    from mrclip_tpu.data.shards import ShardedTarDataset

    def write_shard(path, prefix, n, fill=0):
        with tarfile.open(path, "w") as tf:
            for i in range(n):
                buf = io.BytesIO()
                Image.fromarray(np.full((4, 4, 3), fill, np.uint8)).save(buf, "png")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{prefix}_{i}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = b"caption"
                info = tarfile.TarInfo(f"{prefix}_{i}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))

    # the bad shard's image is all-255; the transform keys off pixel content
    # (it only ever sees the decoded image), so exactly worker 0 dies —
    # shards are assigned round-robin, worker 0 gets 0.tar.
    write_shard(tmp_path / "0.tar", "bad", 1, fill=255)
    write_shard(tmp_path / "1.tar", "good", 40, fill=0)

    def transform(img):
        if np.asarray(img).max() > 128:
            raise RuntimeError("bad shard")
        # slow the healthy stream enough that the fail-fast check runs
        # while worker 1 still has samples left
        time.sleep(0.01)
        return np.zeros((4, 4, 3), np.float32)

    seen = 0
    with pytest.raises(RuntimeError, match="bad shard"):
        ds = ShardedTarDataset(
            f"{tmp_path}/0.tar::{tmp_path}/1.tar",
            transform=transform,
            num_workers=2,
            shuffle=False,
        )
        for _ in ds:
            seen += 1
    assert seen < 40, f"error surfaced only after draining the epoch ({seen})"
