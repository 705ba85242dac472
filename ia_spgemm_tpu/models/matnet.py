"""MatNet — the input-aware format/algorithm selector, in Flax.

Topology replicated from the reference's Keras graph (MatNet.py:45-79),
verified against the shipped weight shapes (NetWeights/Intel_weights.h5):

per image branch (x2):
  Conv 16@3x3 valid stride1 tanh -> MaxPool 2x2
  Conv 16@5x5 stride2 SAME tanh  -> MaxPool 2x2
  Conv 16@5x5 stride2 SAME tanh  -> MaxPool 2x2
  Flatten (4*4*16 = 256) -> Dense 32 tanh
feature branch:
  Dense(nf -> nf) tanh            (nf=26 CPU / 18 GPU, MatNet.py:70-71)
head:
  Concat(32 + 32 + nf) -> Dense(num_classes) softmax
  (CPU classes: MKL/CSR/DIA/ELL/COO, 5; GPU: CUSP/cuSPARSE/NSPARSE, 3 —
   main.cu:539-544)

Unlike the reference, which rebuilds the Keras graph and reloads the h5 on
every prediction (MatNet.py:45-94, K.clear_session), the Flax module is
jitted once and parameters stay resident on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

# CPU-build class menu (README.md:5-8, main.cpp report order).
CPU_CLASSES = ("mkl", "csr", "dia", "ell", "coo")
# GPU-build class menu (main.cu:539-544).
GPU_CLASSES = ("cusp", "cusparse", "nsparse")


class ImageBranch(nn.Module):
    """One density-image CNN branch."""

    @nn.compact
    def __call__(self, x):  # x: (B, 128, 128, 1)
        x = nn.Conv(16, (3, 3), strides=(1, 1), padding="VALID",
                    name="conv1")(x)
        x = jnp.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), strides=(2, 2), padding="SAME",
                    name="conv2")(x)
        x = jnp.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), strides=(2, 2), padding="SAME",
                    name="conv3")(x)
        x = jnp.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))  # (B, 256), HWC row-major like TF
        x = nn.Dense(32, name="dense")(x)
        return jnp.tanh(x)


class MatNet(nn.Module):
    num_classes: int = 5
    num_features: int = 26

    @nn.compact
    def __call__(self, img1, img2, feats):
        """img1/img2: (B, 128, 128, 1) normalized x255/max; feats: (B, nf)."""
        b1 = ImageBranch(name="branch1")(img1)
        b2 = ImageBranch(name="branch2")(img2)
        f = nn.Dense(self.num_features, name="feature_dense")(feats)
        f = jnp.tanh(f)
        h = jnp.concatenate([b1, b2, f], axis=-1)
        return nn.Dense(self.num_classes, name="head")(h)  # logits


@functools.partial(jax.jit, static_argnames=("num_classes", "num_features"))
def _forward(params, img1, img2, feats, *, num_classes, num_features):
    model = MatNet(num_classes=num_classes, num_features=num_features)
    return model.apply({"params": params}, img1, img2, feats)


def predict_logits(params, img1, img2, feats, *, num_classes=5,
                   num_features=26):
    img1 = jnp.asarray(img1, jnp.float32).reshape(1, 128, 128, 1)
    img2 = jnp.asarray(img2, jnp.float32).reshape(1, 128, 128, 1)
    feats = jnp.asarray(feats, jnp.float32).reshape(1, num_features)
    return _forward(params, img1, img2, feats, num_classes=num_classes,
                    num_features=num_features)[0]


def predict_class(params, img1, img2, feats, *, num_classes=5,
                  num_features=26) -> int:
    """argmax class — the reference's Pred() return (MatNet.py:92-96)."""
    logits = predict_logits(params, img1, img2, feats,
                            num_classes=num_classes,
                            num_features=num_features)
    return int(jnp.argmax(logits))


def init_params(key, num_classes=5, num_features=26):
    model = MatNet(num_classes=num_classes, num_features=num_features)
    dummy = (jnp.zeros((1, 128, 128, 1), jnp.float32),
             jnp.zeros((1, 128, 128, 1), jnp.float32),
             jnp.zeros((1, num_features), jnp.float32))
    return model.init(key, *dummy)["params"]
