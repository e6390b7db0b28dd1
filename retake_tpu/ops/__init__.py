from retake_tpu.ops import rope, dpselect, pivotkv, attention  # noqa: F401
