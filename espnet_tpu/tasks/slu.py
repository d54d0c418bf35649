"""Spoken language understanding task.

Behavioral spec: reference `espnet2/slu/` + `espnet2/tasks/asr.py` reuse —
SLU in the reference IS the ASR stack with semantic annotations serialized
into the transcript (e.g. `<intent> transcript words ...`, the SLURP/
FSC recipe convention). The task therefore subclasses ASRTask; the
dedicated inference CLI reports intent accuracy (first decoded token vs
first reference token) alongside WER.
"""

from __future__ import annotations

from espnet_tpu.tasks.asr import ASRTask


class SLUTask(ASRTask):
    name = "slu"
