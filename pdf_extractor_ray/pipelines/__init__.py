"""Pipeline assembly and resumable, checkpointed output."""

from .extract import extraction_pipeline, extraction_pipeline_explicit_split
from .checkpoint import run_with_checkpoints, completed_partitions
