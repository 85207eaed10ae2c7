from dasa_tpu.ops.adain import adain_channel_gate  # noqa: F401
from dasa_tpu.ops.shift_attention import shift_attend  # noqa: F401
