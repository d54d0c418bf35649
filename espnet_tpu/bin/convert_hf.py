"""Convert a HuggingFace wav2vec2/HuBERT/Whisper torch checkpoint into a
flax msgpack pytree consumable by --init_param.

Replaces the reference's runtime download+wrap of fairseq/s3prl/whisper
models (`espnet2/asr/encoder/wav2vec2_encoder.py:1`,
`espnet2/asr/frontend/s3prl.py:1`, `whisper_encoder.py`): conversion is a
one-time offline step; training then transfers the subtree with e.g.

  --init_param out.msgpack:params:encoder/upstream        (wav2vec2 encoder)
  --init_param out.msgpack:params:ssl_frontend/upstream   (S3PRL frontend)
  --init_param out.msgpack:encoder:encoder                (whisper)

Usage:
  python -m espnet_tpu.bin.convert_hf --model_type wav2vec2 \
      --checkpoint /path/model.safetensors --config /path/config.json \
      --out w2v2.msgpack
  (--checkpoint may also be a HF model directory containing both files)
"""

from __future__ import annotations

import argparse
import json
import types
from pathlib import Path


def _resolve(checkpoint: str, config: str):
    ckpt = Path(checkpoint)
    if ckpt.is_dir():
        cfg_path = ckpt / "config.json"
        for name in ("model.safetensors", "pytorch_model.bin"):
            if (ckpt / name).exists():
                ckpt = ckpt / name
                break
        else:
            raise FileNotFoundError(f"no weights file in {checkpoint}")
    else:
        cfg_path = Path(config) if config else ckpt.parent / "config.json"
    with open(cfg_path) as f:
        hf_cfg = types.SimpleNamespace(**json.load(f))
    return ckpt, hf_cfg


def main(argv=None) -> None:
    from espnet_tpu.train import hf_import
    from espnet_tpu.train.checkpoint import save_pytree
    from espnet_tpu.utils.config import dataclass_to_dict

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", required=True,
                   choices=["wav2vec2", "hubert", "whisper"])
    p.add_argument("--checkpoint", required=True,
                   help="torch .bin/.pt/.safetensors file or HF model dir")
    p.add_argument("--config", default="",
                   help="HF config.json (defaults to alongside checkpoint)")
    p.add_argument("--out", required=True, help="output .msgpack path")
    args = p.parse_args(argv)

    ckpt, hf_cfg = _resolve(args.checkpoint, args.config)
    sd = hf_import.load_torch_state_dict(str(ckpt))
    # HF task heads prefix the trunk ('wav2vec2.', 'hubert.', 'model.') —
    # strip it so keys match the bare trunk layout.
    for prefix in ("wav2vec2.", "hubert.", "model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break

    if args.model_type in ("wav2vec2", "hubert"):
        cfg = hf_import.ssl_config_from_hf(hf_cfg)
        tree = {"params": hf_import.wav2vec2_params_from_torch(sd, cfg)}
    else:
        cfg = hf_import.whisper_config_from_hf(hf_cfg)
        tree = {
            "encoder": hf_import.whisper_encoder_params_from_torch(sd, cfg),
            "decoder": hf_import.whisper_decoder_params_from_torch(sd, cfg),
        }
    save_pytree(args.out, tree)
    meta = dataclass_to_dict(cfg)
    meta.pop("dtype", None)
    with open(str(args.out) + ".json", "w") as f:
        json.dump({"model_type": args.model_type, "config": meta}, f, indent=2)
    print(f"wrote {args.out} ({args.model_type}); "
          f"config sidecar: {args.out}.json")


if __name__ == "__main__":
    main()
