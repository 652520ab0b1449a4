"""Checkpoint conversion CLI: reference torch .pth <-> orbax variables.

Covers both interop directions (reference train.py:54-123 checkpoint kinds):
  - import: published HF / reference .pth (raw state_dict, EMA dict, or a
    full training checkpoint) -> orbax variables directory,
  - export: orbax variables -> reference-compatible torch state dict
    (loadable by the reference's evaluate.py / train.py warm start).

Usage:
    python -m cabinet_tpu.cli.convert_checkpoint import cabinet.pth out_dir \
        [--mode large|small|auto] [--n-classes 8]
    python -m cabinet_tpu.cli.convert_checkpoint export orbax_dir out.pth \
        --mode large --n-classes 8
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence


def _detect_mode(sd) -> str:
    for k, v in sd.items():
        if k == "mobile.conv.0.weight" and hasattr(v, "shape"):
            return "large" if v.shape[0] == 960 else "small"
    return "large"


def do_import(src: Path, dst: Path, mode: str) -> None:
    from cabinet_tpu.models.mobilenetv3 import default_cfgs
    from cabinet_tpu.train.checkpoint import CheckpointManager
    from cabinet_tpu.utils.torch_convert import load_torch_checkpoint, torch_to_flax

    sd = load_torch_checkpoint(src)
    if mode == "auto":
        mode = _detect_mode(sd)
    variables = torch_to_flax(sd, default_cfgs(mode), strict=False)
    mgr = CheckpointManager(dst.parent)
    mgr.save_variables(dst.name, variables)
    print(f"[DONE] {src} ({mode}) -> {dst}")


def do_export(src: Path, dst: Path, mode: str, n_classes: int) -> None:
    import jax
    import jax.numpy as jnp
    import torch

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.models.mobilenetv3 import default_cfgs
    from cabinet_tpu.train.checkpoint import load_any_checkpoint
    from cabinet_tpu.utils.torch_convert import flax_to_torch

    model = CABiNet(n_classes=n_classes, mode=mode)
    template = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False))()
    variables = load_any_checkpoint(src, template)
    sd = {k: torch.from_numpy(v.copy())
          for k, v in flax_to_torch(variables, default_cfgs(mode)).items()}
    torch.save(sd, dst)
    print(f"[DONE] {src} -> {dst} ({len(sd)} tensors)")


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("import", help="torch .pth -> orbax")
    pi.add_argument("src", type=Path)
    pi.add_argument("dst", type=Path)
    pi.add_argument("--mode", default="auto", choices=["auto", "large", "small"])

    pe = sub.add_parser("export", help="orbax -> torch .pth")
    pe.add_argument("src", type=Path)
    pe.add_argument("dst", type=Path)
    pe.add_argument("--mode", default="large", choices=["large", "small"])
    pe.add_argument("--n-classes", type=int, default=8)

    args = p.parse_args(argv)
    if args.cmd == "import":
        do_import(args.src, args.dst, args.mode)
    else:
        do_export(args.src, args.dst, args.mode, args.n_classes)


if __name__ == "__main__":
    main()
