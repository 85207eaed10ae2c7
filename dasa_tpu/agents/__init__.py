from dasa_tpu.agents.seq2seq import Seq2SeqAgent  # noqa: F401
from dasa_tpu.agents.speaker import SpeakerAgent  # noqa: F401
