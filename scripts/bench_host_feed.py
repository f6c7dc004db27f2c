"""Host data-feed microbenchmark: decode img/s vs cached-canvas img/s.

Answers VERDICT r1 #6 / r2 #1: can this host (1 CPU core) feed the TPU
train step? Part 1 measures the exact per-image decode work
``HFSource._decode`` does (PIL JPEG decode -> C++ resize_center_crop to
the R x R uint8 canvas), threaded like the loader. Part 2 measures
``CachedSource`` shuffled batch reads from a ``build_canvas_cache``
memmap — the production feed path. Numbers are recorded in BASELINE.md
("host feed").

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
        print(
            f"decode workers={workers}: {n / dt:8.1f} img/s  "
            f"({dt / n * 1000:.2f} ms/img)"
        )

    # ---- part 2: cached-canvas reads (the production path) --------------
    import tempfile

    from basd_tpu.data.cache import CachedSource, build_canvas_cache

    class _CanvasSource:
        """Feeds the pre-decoded canvases into build_canvas_cache."""

        def __init__(self, canvases):
            self.canvases = canvases

        def split_size(self, split):
            return len(self.canvases)

        def num_classes(self):
            return 10

        def load_batches(self, split, bs, out_size, **kw):
            for s in range(0, len(self.canvases), bs):
                chunk = self.canvases[s : s + bs]
                yield {
                    "image": np.stack(chunk),
                    "label": np.zeros(len(chunk), np.int32),
                }

    canvases = [decode_one(b) for b in blobs]
    with tempfile.TemporaryDirectory() as td:
        build_canvas_cache(
            _CanvasSource(canvases), "bench", td, out,
            splits=("train",), verbose=False,
        )
        cached = CachedSource("bench", td)
        batch_size = min(256, n)

        def read_epoch(seed):
            total = 0
            for b in cached.load_batches(
                "train", batch_size, out,
                shuffle=True, seed=seed, drop_last=False,
            ):
                total += int(b["image"][0, 0, 0, 0]) * 0 + b["image"].shape[0]
            return total

        read_epoch(0)  # warm the page cache
        t0 = time.perf_counter()
        epochs = 5
        for e in range(epochs):
            read_epoch(e + 1)
        dt = time.perf_counter() - t0
        rate = n * epochs / dt
        print(
            f"cached  workers=0: {rate:8.1f} img/s  "
            f"({dt / (n * epochs) * 1000:.3f} ms/img, shuffled memmap "
            f"batches of {batch_size})"
        )


if __name__ == "__main__":
    main()
