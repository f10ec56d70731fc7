"""Image quantization demo — all four algorithms on an RGB image.

The TPU-native analog of the reference's demo
(reference: pyvq/scripts/image_quantization_demo.py): BQ and SQ quantize
per channel, PQ and TSVQ treat each pixel row as a vector, and a size- and
quality-reduction table is printed at the end (reference :50-131, 217-225).

Usage:
    python examples/image_quantization_demo.py [image.png]

Without an argument a synthetic 1024x1024 RGB test image is generated (no
dataset download needed; the reference demo also ships its own PNG).
"""

from __future__ import annotations

import sys

import numpy as np


def load_image(path: str | None) -> np.ndarray:
    """Return an [H, W, 3] uint8 image."""
    if path is not None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    # Synthetic but structured: smooth gradients + texture, like a photo's
    # statistics (pure noise would make every quantizer look bad).
    h = w = 1024
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 128 + 80 * np.sin(xx / 97.0) + 40 * np.cos(yy / 53.0)
    g = 128 + 90 * np.cos((xx + yy) / 151.0)
    b = 128 + 70 * np.sin(np.hypot(xx - w / 2, yy - h / 2) / 71.0)
    rng = np.random.default_rng(66)
    img = np.stack([r, g, b], axis=-1) + rng.normal(0, 6, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0**2 / mse)) if mse > 0 else float("inf")


def main() -> None:
    from vq_tpu import TSVQ, BinaryQuantizer, ProductQuantizer, ScalarQuantizer

    img = load_image(sys.argv[1] if len(sys.argv) > 1 else None)
    h, w, _ = img.shape
    f = img.astype(np.float32)
    raw_bytes = img.size * 4  # f32 elements, like the reference's table
    rows = []

    # --- Scalar quantization per channel (reference demo :50-69) ----------
    for levels in (8, 16):
        sq = ScalarQuantizer(0.0, 255.0, levels)
        codes = np.asarray(sq.quantize(f))
        recon = np.asarray(sq.dequantize(codes))
        bits = int(np.ceil(np.log2(levels)))
        size = img.size * bits / 8
        rows.append((f"Scalar ({levels} levels)", size, psnr(f, recon)))

    # --- Binary quantization per channel (reference demo :71-88) ----------
    bq = BinaryQuantizer(threshold=127.5, low=0, high=255)
    packed = np.asarray(bq.quantize_packed(f.reshape(-1, 3 * w)))
    recon = np.asarray(
        bq.dequantize_packed(packed, 3 * w)
    ).reshape(h, w, 3)
    rows.append(("Binary (packed 1-bit)", packed.size * 4, psnr(f, recon)))

    # --- Product quantization, rows as vectors (reference demo :90-110) ---
    vecs = f.reshape(h, w * 3)  # each image row is one vector
    m = w * 3 // 96  # sub_dim 96
    pq = ProductQuantizer(vecs, num_subspaces=m, num_centroids=16, max_iters=8)
    codes = np.asarray(pq.encode(vecs))
    recon = np.asarray(pq.decode(codes)).reshape(h, w, 3)
    pq_size = codes.size * codes.itemsize + pq.codebooks.size * 4
    rows.append((f"PQ ({m}x16 + codebook)", pq_size, psnr(f, recon)))

    # --- TSVQ, rows as vectors (reference demo :112-131) ------------------
    tsvq = TSVQ(vecs, max_depth=6)
    codes = np.asarray(tsvq.encode(vecs))
    recon = np.asarray(tsvq.decode(codes)).reshape(h, w, 3)
    ts_size = codes.size * 2 + tsvq.tree.centroids.size * 4
    rows.append((f"TSVQ (depth 6, {tsvq.num_leaves} leaves)", ts_size, psnr(f, recon)))

    # --- Report (reference demo :217-225) ---------------------------------
    print(f"image: {h}x{w} RGB — raw f32 {raw_bytes / 1e6:.1f} MB")
    print(f"{'method':<28} {'size':>10} {'reduction':>10} {'PSNR dB':>8}")
    for name, size, quality in rows:
        red = 100 * (1 - size / raw_bytes)
        print(f"{name:<28} {size / 1e3:>8.0f}KB {red:>9.1f}% {quality:>8.1f}")


if __name__ == "__main__":
    main()
