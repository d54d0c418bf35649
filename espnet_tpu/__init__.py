"""espnet_tpu — a TPU-native end-to-end speech processing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of ESPnet
(reference: DavidLBick/espnet-1). The compute path is pure-functional JAX
(flax.linen modules, custom-VJP loss kernels, `lax.while_loop` beam search)
compiled once per shape-bucket with `jax.jit`/`shard_map` over a
`jax.sharding.Mesh`; the data plane is a host-side numpy pipeline feeding
device-sharded, statically-shaped batches.

Layer map (mirrors the reference's layer map, SURVEY.md §1):
  ops/       signal ops + losses (STFT/fbank frontend, SpecAug, CTC, masks)
  models/    flax modules (attention, conformer, transformer, ASR/LM/TTS models)
  data/      Kaldi-free data dirs, tokenizers, length-bucketed batching
  train/     trainer runtime: train step, reporter, checkpointing, schedules
  parallel/  mesh construction + sharding rules (data/tensor parallel)
  decode/    batched beam search, CTC prefix scoring, scorer fusion
  tasks/     task assembly (ASR, LM, TTS) from YAML configs
  bin/       CLI entry points
"""

__version__ = "0.1.0"
