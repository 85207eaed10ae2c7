from dasa_tpu.agents.seq2seq import Seq2SeqAgent  # noqa: F401
