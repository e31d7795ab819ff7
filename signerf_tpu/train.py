"""CLI entry point: `python -m signerf_tpu.train <method> [--a.b.c value ...]`.

Capability parity (SURVEY.md §2b "CLI/config system"): replaces the
tyro-generated `ns-train signerf` entry point (reference pyproject.toml:44-46)
with the same dotted-flag override convention
(`--pipeline.dataset-generator.diffuser.prompt "..."`, README.md:117-131),
implemented by signerf_tpu.config.

Common flags (parity with ns-train):
  --data PATH                  dataset directory (transforms.json)
  --load-dir PATH              checkpoint dir of the pre-trained nerfacto
  --output-dir PATH            experiment output root
  --skip-interface True        headless generate+train
  --skip-generation True       reuse --generated-dataset-dir
  --train-only True            plain nerfacto training, no editing flow
  --mesh SPEC                  device mesh: auto (default) | none | data |
                               production | name=size[,name=size...].
                               "auto" on a v5e-8 builds the production
                               (data=4, tensor=2) layout: NeRF train/render
                               DP over all 8 chips, SDXL TP=2 x view-DP=4.
"""

from __future__ import annotations

import sys
from pathlib import Path

from signerf_tpu import config as cfglib
from signerf_tpu.engine.trainer import SIGNeRFTrainer
from signerf_tpu.method_configs import METHODS


def main(argv=None) -> int:
    from signerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("methods:", ", ".join(METHODS))
        return 0
    method = argv.pop(0)
    if method not in METHODS:
        print(f"unknown method {method!r}; available: {', '.join(METHODS)}")
        return 1
    config = METHODS[method]()

    overrides = cfglib.parse_cli_overrides(argv)
    # convenience aliases (parity with ns-train's top-level flags)
    train_only = str(
        overrides.pop("train-only", overrides.pop("train_only", "false"))
    ).lower() in ("1", "true", "yes")
    if "data" in overrides:
        overrides["pipeline.datamanager.dataparser.data"] = overrides.pop("data")
    mesh_spec = overrides.pop("mesh", "auto")
    config = cfglib.apply_overrides(config, overrides)

    from signerf_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(mesh_spec)
    if mesh is not None:
        print(f"[train] device mesh: {dict(mesh.shape)}")

    trainer = SIGNeRFTrainer(config, mesh=mesh)
    trainer.setup()
    if train_only:
        trainer.train()
    elif config.skip_interface:
        trainer.run_headless()
    else:
        # Interface/viewer mode: start paused; the Generation tab's
        # "Generate Dataset & Train" triggers the headless flow.
        try:
            from signerf_tpu.interface.app import run_interface

            run_interface(trainer)
        except ImportError:
            print(
                "[train] viewer dependencies unavailable; running headless "
                "(equivalent to --skip-interface True)"
            )
            trainer.run_headless()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
