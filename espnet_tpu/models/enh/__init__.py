from espnet_tpu.models.enh.model import EnhancementModel, EnhConfig  # noqa: F401
