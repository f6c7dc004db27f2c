"""Dump the compiled train-step HLO to a file and print requested
instruction lines (full shapes) — companion to profile_step.py.

Usage: python scripts/dump_hlo.py /tmp/step.hlo slice.1841 reshape.2031 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    wanted = sys.argv[2:]

    import jax

    from scripts.profile_step import _setup

    trainer, sharded = _setup(512)
    key = jax.random.PRNGKey(0)
    compiled = trainer._train_step.jitted.lower(
        trainer.opt_state, trainer.teacher_vars, trainer.sel_buffers,
        trainer._train_step.prepare(sharded["image"]),
        sharded["image"], sharded["label"], key,
    ).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")
    for name in wanted:
        for line in txt.splitlines():
            if f"%{name} = " in line or line.strip().startswith(f"{name} = "):
                print(line.strip()[:400])


if __name__ == "__main__":
    main()
