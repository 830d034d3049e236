"""em_adapt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for EM-Adapt
weakly-supervised semantic segmentation.

Re-designed from scratch with the capabilities of the TF1/CUDA reference
``xtudbxk/em-adapt-tensorflow`` (see SURVEY.md): DeepLab-LargeFOV (VGG-16 +
atrous convolutions) trained on PASCAL VOC 2012 + SBD with image-level tags
only, via an adaptive-bias E-step (Papandreou et al., arXiv:1502.02734).

TPU-first design notes
----------------------
* The whole train step — forward, E-step, loss, backward, psum, optimizer —
  is ONE jitted function; the reference's per-step host round-trips
  (tf.data ``sess.run``, ``feed_dict`` re-upload, ``tf.py_func`` E-step;
  reference deeplab.py:120, :265-267) do not exist here.
* The E-step runs on device: a pure-JAX implementation
  (:mod:`em_adapt_tpu.ops.estep`) and a fused Pallas TPU kernel
  (:mod:`em_adapt_tpu.ops.estep_pallas`), both pixel-exact against the
  numpy oracle (:mod:`em_adapt_tpu.ops.estep_oracle`).
* Scaling is mesh-based: ``jax.sharding.Mesh`` + ``pjit`` with the batch
  sharded over a ``data`` axis and gradients psum'd over ICI
  (:mod:`em_adapt_tpu.parallel`).
"""

from em_adapt_tpu.version import __version__

__all__ = ["__version__"]
