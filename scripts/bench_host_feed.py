"""Host data-feed microbenchmark: JPEG decode + native resize img/s.

Answers VERDICT r1 #6: can this host (1 CPU core) decode + aspect-resize
fast enough to feed the TPU train step? Generates in-memory JPEGs at
ImageNet-like resolutions, then measures the exact per-image host work
``HFSource._decode`` does (PIL decode -> C++ resize_center_crop to the
R x R uint8 canvas), threaded like the loader.

Usage: python scripts/bench_host_feed.py [n_images] [out_size]
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = int(sys.argv[2]) if len(sys.argv) > 2 else 293  # 224 / (224/256)

    from PIL import Image

    from basd_tpu.data.native import native_available, resize_center_crop

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(n):
        h = int(rng.integers(280, 500))
        w = int(rng.integers(280, 500))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        blobs.append(buf.getvalue())
    print(
        f"feed bench: {n} jpegs, avg {sum(map(len, blobs)) / n / 1024:.0f} KiB, "
        f"out={out}px, native_resize={native_available()}",
        file=sys.stderr,
    )

    def decode_one(blob):
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        return resize_center_crop(np.asarray(img, np.uint8), out)

    for workers in (1, 4, 8):
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(decode_one, blobs[:32]))  # warm
            t0 = time.perf_counter()
            res = list(pool.map(decode_one, blobs))
            dt = time.perf_counter() - t0
        assert all(r.shape == (out, out, 3) for r in res)
        print(f"workers={workers}: {n / dt:8.1f} img/s  ({dt / n * 1000:.2f} ms/img)")


if __name__ == "__main__":
    main()
