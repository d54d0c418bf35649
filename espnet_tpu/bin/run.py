"""Recipe runner: the `run.sh` equivalent.

Drives the staged pipeline of `espnet_tpu/recipe.py` (reference
`egs2/TEMPLATE/asr1/asr.sh` called from `egs2/<corpus>/asr1/run.sh`):

    python -m espnet_tpu.bin.run --config conf/recipe.yaml \
        --recipe.stage 1 --recipe.stop_stage 12

All RecipeConfig fields are exposed as `--recipe.<field>` flags; YAML
config files use a top-level `recipe:` section. Stages already completed
(`.stage<N>.done` markers in the exp dir) are skipped; `--force true`
re-runs them.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

from espnet_tpu.recipe import Recipe, RecipeConfig
from espnet_tpu.utils.config import dataclass_from_dict, load_yaml


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--force", default="false")
    for f in dataclasses.fields(RecipeConfig):
        p.add_argument(f"--recipe.{f.name}", dest=f"recipe_{f.name}",
                       default=None)
    args = p.parse_args(argv)

    if args.config:
        raw = load_yaml(args.config)
        cfg = dataclass_from_dict(RecipeConfig, raw.get("recipe", raw))
    else:
        cfg = RecipeConfig()
    overrides = {}
    for f in dataclasses.fields(RecipeConfig):
        v = getattr(args, f"recipe_{f.name}")
        if v is not None:
            overrides[f.name] = type(getattr(cfg, f.name))(v) \
                if not isinstance(getattr(cfg, f.name), bool) \
                else v.lower() in ("1", "true", "yes")
    cfg = dataclasses.replace(cfg, **overrides)
    Recipe(cfg).run(force=args.force.lower() in ("1", "true", "yes"))


if __name__ == "__main__":
    main()
