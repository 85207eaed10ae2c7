from dasa_tpu.train.evaluation import Evaluation  # noqa: F401
