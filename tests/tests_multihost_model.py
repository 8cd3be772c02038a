"""Shared model/step/batch construction for the multi-host integration test.

Imported by BOTH the 2-process workers and the in-process single-device
reference run, so all three compute the same mathematical step from the
same initial weights and the same global batch (SURVEY.md §2.5
communication-backend row; the reference has no multi-process path at all).
"""

import numpy as np
import jax

IMG = 32
GLOBAL_BATCH = 8


def build_step_and_batch():
    from cswin_simam_unet_tpu.models import UNet
    from cswin_simam_unet_tpu.train.engine import (
        create_train_state,
        make_train_step,
    )

    # Small UNet: exercises conv stacks + BatchNorm batch-stat psum over
    # the data axis — the collective-heavy part of DP training.
    model = UNet(base_features=8, use_simam=True)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, IMG, IMG, 3), "adam", 1e-3, 1e-4)
    step = make_train_step(model, n_classes=1, augment=None, donate=False)

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (GLOBAL_BATCH, IMG, IMG, 3), dtype=np.uint8)
    masks = (rs.randint(0, 2, (GLOBAL_BATCH, IMG, IMG, 1),
                        dtype=np.uint8) * 255)
    return model, step, state, images, masks
