"""Checkpointing (L8): orbax manager + reference torch-checkpoint converter."""

from havatar_tpu.checkpoints.io import CheckpointManager
from havatar_tpu.checkpoints import convert
