"""Command-line drivers (L4/L5).

Public entry points mirror the reference CLIs:
  python -m havatar_tpu.cli.train_avatar   --datadir D --logdir L [--config C --ckpt K]
  python -m havatar_tpu.cli.train_avatarHD --datadir D --logdir L --ckpt K [--continue-training]
  python -m havatar_tpu.cli.reenact        --ckpt K --savedir S --split J [--config C]
(reference: train_avatar.py:33-38, train_avatarHD.py:81-87,
avatarHD_reenactment.py:104-120; the README's phantom --torch_test flag is a
doc bug not replicated, SURVEY.md §2.4)
"""
