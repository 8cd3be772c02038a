"""cswin_simam_unet_tpu — a TPU-native segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the PyTorch
reference TrungMasterChef/CSWin-SimAM-UNet (two monolithic training scripts,
`train_unet_segmentation.py` and `train_cswinunet_segmentation.py`):

* ``models``   — UNet and CSWin-UNet (cross-shaped-window stripe attention with
  LePE, Merge-Block downsampling, CARAFE upsampling) plus SimAM attention,
  as pure flax modules returning logits, NHWC layouts.
* ``ops``      — functional compute primitives: window layout shuffles, stripe
  attention (XLA einsum path + fused Pallas TPU kernel), CARAFE reassembly,
  SimAM energy attention, on-device image ops.
* ``data``     — paired image/mask dataset, host JPEG decode, on-device
  flip/rot90/crop-resize augmentation under jit with explicit PRNG keys.
* ``train``    — jitted train/eval steps, Adam/AdamW via optax,
  reduce-on-plateau scheduling, Dice/IoU metrics, CSV/PNG/console reporting,
  orbax checkpoint/resume.
* ``parallel`` — device mesh + NamedSharding data/tensor parallelism over ICI.
* ``compat``   — one-way PyTorch state_dict importer for golden parity tests.
"""

__version__ = "0.1.0"

from cswin_simam_unet_tpu import ops, models  # noqa: F401
