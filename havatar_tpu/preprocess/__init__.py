"""Offline preprocessing (L7): FaceVerse 3DMM, jitted fitting, TPU-native
rasterizer, condition rendering, split writers, animation drivers, and
pluggable landmark/matting backends."""

from havatar_tpu.preprocess import faceverse
from havatar_tpu.preprocess import fitting
from havatar_tpu.preprocess import rasterizer
from havatar_tpu.preprocess import pipeline
from havatar_tpu.preprocess import animation
from havatar_tpu.preprocess import landmarks
from havatar_tpu.preprocess import matting
