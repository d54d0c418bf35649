"""ASR task: data dirs -> tokenizer/token-list -> collect-stats -> train.

Behavioral spec: reference `espnet2/tasks/asr.py` (component choices for
frontend/specaug/normalize/encoder/decoder assembled into ESPnetASRModel)
+ the recipe stages 5/10/11 of `egs2/TEMPLATE/asr1/asr.sh` (token list,
collect stats, train) collapsed into one `run()`.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.dataset import ASRDataset, EpochIterator
from espnet_tpu.data.sampler import build_batches
from espnet_tpu.data.tokenizer import TokenIDConverter, build_token_list, build_tokenizer
from espnet_tpu.models.asr import ASRConfig, ASRModel
from espnet_tpu.tasks.abs_task import AbsTask, OptimConfig, RunConfig
from espnet_tpu.train.collect_stats import collect_stats, load_stats, mvn_variables
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import Trainer, TrainerOptions

logger = logging.getLogger("espnet_tpu")


@dataclasses.dataclass(frozen=True)
class ASRDataConfig:
    train_dir: str = ""
    valid_dir: str = ""
    fs: int = 16000
    input_type: str = "raw"            # raw (wav.scp) | feats (feats.scp)
    token_type: str = "char"           # char | word | bpe
    token_list: str = ""               # path; built from train text if missing
    bpe_model: str = ""
    bpe_vocab_size: int = 300
    batch_bins: int = 0
    batch_size: int = 16
    length_quantum: int = 4096
    text_quantum: int = 8
    # 0 = auto: one shard per jax process (multi-host data parallelism)
    num_shards: int = 0
    shard_index: int = -1
    # batches sized to a multiple of this (0 = auto from the device mesh);
    # required to shard the batch axis without padding (parallel/api.py)
    size_multiple: int = 0
    # keep (N, C) multichannel wavs (WPE/beamformer front-end in the model)
    multichannel: bool = False
    # on-access augmentation (CommonPreprocessor speech path,
    # `espnet2/train/preprocessor.py:283`; train split only)
    rir_scp: str = ""
    rir_apply_prob: float = 1.0
    noise_scp: str = ""
    noise_apply_prob: float = 1.0
    noise_db_range: str = "13_15"
    # rescale waveform peak to this value (applies to valid/decode too)
    speech_volume_normalize: float = 0.0
    # YAML transform pipeline applied to loaded speech on access
    # (data/transform.py Transformation; the reference's --preprocess-conf
    # consumed via LoadInputsAndTargets, `espnet/utils/io_utils.py:14`).
    # Typically pairs with model.input_type=feats when the pipeline emits
    # features (fbank/stft/cmvn/delta) from raw wavs.
    preprocess_conf: str = ""


@dataclasses.dataclass(frozen=True)
class ASRModelSection(ASRConfig):
    """ASRConfig with vocab_size injected from the token list at build."""

    vocab_size: int = -1


class ASRTask(AbsTask):
    name = "asr"
    sections = {
        "run": RunConfig,
        "optim": OptimConfig,
        "data": ASRDataConfig,
        "model": ASRModelSection,
    }
    # per-step model RNG streams (subclasses add theirs, e.g. maskctc "mask")
    rng_names = ("dropout", "specaug")

    # --- builders --------------------------------------------------------
    @classmethod
    def build_tokenizer(cls, data: ASRDataConfig, output_dir: Path, texts=None):
        if data.token_type == "bpe":
            model_path = data.bpe_model or str(output_dir / "bpe.json")
            if not Path(model_path).exists():
                if texts is None:
                    raise FileNotFoundError(f"bpe model missing: {model_path}")
                from espnet_tpu.data.tokenizer import BpeTokenizer

                logger.info("training BPE model -> %s", model_path)
                BpeTokenizer.train(texts, data.bpe_vocab_size, model_path)
            return build_tokenizer("bpe", model_path)
        return build_tokenizer(data.token_type)

    @classmethod
    def build_token_list(cls, data, output_dir: Path, tokenizer, texts=None):
        path = Path(data.token_list) if data.token_list else output_dir / "tokens.txt"
        if path.exists():
            return TokenIDConverter.from_file(path)
        if texts is None:
            raise FileNotFoundError(f"token list missing: {path}")
        conv = TokenIDConverter(build_token_list(texts, tokenizer))
        conv.save(path)
        logger.info("built token list (%d) -> %s", len(conv), path)
        return conv

    @classmethod
    def build_dataset(cls, data: ASRDataConfig, datadir, tokenizer, converter,
                      train: bool = True):
        dd = Path(datadir)
        kw = dict(text=dd / "text", tokenizer=tokenizer, converter=converter,
                  fs=data.fs)
        if data.preprocess_conf:
            from espnet_tpu.data.transform import Transformation

            kw["transform"] = Transformation(data.preprocess_conf)
            kw["transform_train"] = train
        if data.input_type == "raw":
            pre = None
            if (data.rir_scp or data.noise_scp
                    or data.speech_volume_normalize):
                from espnet_tpu.data.preprocess import SpeechPreprocessor

                pre = SpeechPreprocessor(
                    rir_scp=data.rir_scp or None,
                    rir_apply_prob=data.rir_apply_prob,
                    noise_scp=data.noise_scp or None,
                    noise_apply_prob=data.noise_apply_prob,
                    noise_db_range=data.noise_db_range,
                    speech_volume_normalize=(
                        data.speech_volume_normalize or None),
                    train=train,
                )
            return ASRDataset(wav_scp=dd / "wav.scp",
                              multichannel=data.multichannel,
                              preprocessor=pre, **kw)
        return ASRDataset(feats_scp=dd / "feats.scp", **kw)

    @classmethod
    def build_model(cls, model_cfg: ASRModelSection, vocab_size: int) -> ASRModel:
        d = dataclasses.asdict(model_cfg)
        d["vocab_size"] = vocab_size
        d.pop("dtype", None)
        dtype = model_cfg.dtype
        if isinstance(dtype, str):
            import jax.numpy as jnp

            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
        return ASRModel(ASRConfig(dtype=dtype, **d))

    # --- run -------------------------------------------------------------
    @classmethod
    def run(cls, cfg: Dict[str, Any]):
        run: RunConfig = cfg["run"]
        data: ASRDataConfig = cfg["data"]
        out = Path(run.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        cls.dump_config(cfg, out)

        from espnet_tpu.data.fileio import read_2column_text

        train_texts = list(read_2column_text(Path(data.train_dir) / "text").values())
        tokenizer = cls.build_tokenizer(data, out, train_texts)
        converter = cls.build_token_list(data, out, tokenizer, train_texts)
        train_ds = cls.build_dataset(data, data.train_dir, tokenizer, converter)
        valid_ds = (
            cls.build_dataset(data, data.valid_dir, tokenizer, converter,
                              train=False)
            if data.valid_dir else None
        )

        # multi-host resolution (replaces rank/world-size env plumbing,
        # `espnet2/train/distributed_utils.py:200-370`): each process takes
        # every num_shards-th batch, and the per-process batches are the
        # local shards of the global array (parallel/api.py make_batch_put)
        import jax as _jax

        num_shards = data.num_shards or _jax.process_count()
        shard_index = (
            data.shard_index if data.shard_index >= 0 else _jax.process_index()
        )
        size_multiple = data.size_multiple or 1

        def make_batches(ds):
            shapes = {"speech": ds.speech_lengths(), "text": ds.text_lengths()}
            return build_batches(
                shapes,
                batch_bins=data.batch_bins,
                batch_size=0 if data.batch_bins else data.batch_size,
                length_quantum=data.length_quantum,
                text_quantum=data.text_quantum,
                size_multiple=size_multiple,
            )

        train_batches = make_batches(train_ds)
        train_iter = EpochIterator(
            train_ds, train_batches, seed=run.seed,
            num_shards=num_shards, shard_index=shard_index,
        )
        valid_iter = (
            EpochIterator(valid_ds, make_batches(valid_ds), seed=run.seed,
                          shuffle=False, num_shards=num_shards,
                          shard_index=shard_index)
            if valid_ds else None
        )

        model = cls.build_model(cfg["model"], len(converter))

        # collect-stats stage (global MVN)
        extra_init = None
        if model.config.normalize == "global_mvn" and run.collect_stats:
            stats_path = out / "stats" / "feats_stats.npz"
            if not stats_path.exists():
                logger.info("collect_stats -> %s", stats_path.parent)
                collect_stats(
                    train_ds, train_batches, stats_path.parent,
                    fs=data.fs, n_fft=model.config.n_fft,
                    hop_length=model.config.hop_length,
                    n_mels=model.config.n_mels,
                    input_type=model.config.input_type,
                )
            extra_init = {"mvn": mvn_variables(load_stats(stats_path))}
        if run.stats_only:
            logger.info("stats_only: stopping after collect-stats stage")
            return None

        opt: OptimConfig = cfg["optim"]
        tx = build_optimizer(
            opt.name, opt.lr, opt.schedule, opt.warmup_steps,
            model.config.d_model, opt.weight_decay,
            (opt.b1, opt.b2), opt.eps, opt.grad_clip,
        )
        phase, key, mode = run.best_metric.split(".")
        trainer = Trainer(
            model, tx, out,
            rng_names=cls.rng_names,
            options=TrainerOptions(
                max_epoch=run.max_epoch,
                patience=run.patience,
                keep_nbest=run.keep_nbest,
                best_metric=(phase, key, mode),
                log_interval=run.log_interval,
                seed=run.seed,
                resume=run.resume,
                accum_grad=run.accum_grad,
                init_param=tuple(
                    s for s in run.init_param.split(",,") if s
                ),
                plot_attention=run.plot_attention,
                use_wandb=run.use_wandb,
                wandb_project=run.wandb_project,
                profile_steps=run.profile_steps,
            ),
        )
        batch0 = next(train_iter.epoch(0))
        batch0.pop("keys", None)
        state = trainer.init_state(batch0, extra_init)
        state = trainer.run(state, train_iter, valid_iter)
        logger.info("training finished: %s", out)
        return state, trainer, model, tokenizer, converter
