from dasa_tpu.models.policy import (  # noqa: F401
    DasaPolicy,
    DecoderState,
    StepInputs,
    bert_config_from,
)
from dasa_tpu.models.bert import BertConfig, DicModel  # noqa: F401
from dasa_tpu.models.encoder import DicEncoder, EncoderLSTM  # noqa: F401
from dasa_tpu.models.decoder import (  # noqa: F401
    AttnDecoderLSTM,
    BAttnDecoderLSTM,
    Critic,
)
