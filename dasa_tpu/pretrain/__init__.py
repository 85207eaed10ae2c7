from dasa_tpu.pretrain.model import DicAddActionPreTrain, DicPMActionPreTrain  # noqa: F401
from dasa_tpu.pretrain.data import (  # noqa: F401
    generate_pretrain_records,
    mask_tokens,
    PretrainBatcher,
)
