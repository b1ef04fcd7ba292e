"""pipnet_tpu: a TPU-native JAX/XLA/Pallas framework with the capabilities of
PIP-Net / HComP-Net (interpretable prototype-based fine-grained classification,
flat and hierarchical over a phylogenetic tree).

Subpackages
-----------
tree     Newick parsing, class-hierarchy trees, tree->array compiler
models   flax backbones (ConvNeXt / ResNet) + the stacked prototype head
ops      segment ops and Pallas kernels for the prototype head
losses   the full HComP-Net loss catalog as pure functions
data     host-side two-view TrivialAugment pipeline
train    two-phase training engine (optax, pjit data parallel, checkpoints)
eval     joint-distribution decoding and metrics
interp   prototype visualization, pruning, part purity
runtime  mesh / logging / config plumbing
"""

__version__ = "0.1.0"
