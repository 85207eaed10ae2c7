from dasa_tpu.pipelines.depth_features import featurize_views  # noqa: F401
