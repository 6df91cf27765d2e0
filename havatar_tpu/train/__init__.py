"""Training loops (L4): stage-1 NeRF, stage-2 GAN, losses, EMA, LPIPS."""

from havatar_tpu.train import losses
from havatar_tpu.train.ema import ema_update
from havatar_tpu.train import stage1, stage2
