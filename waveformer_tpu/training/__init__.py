from waveformer_tpu.training.losses import (  # noqa: F401
    DiceCELoss,
    dice_bce_loss,
    dice_ce_loss,
    soft_dice_loss,
    deep_supervision_loss,
)
from waveformer_tpu.training.schedules import (  # noqa: F401
    make_schedule,
    poly_schedule,
    warmup_cosine_schedule,
    constant_with_warmup_schedule,
)
