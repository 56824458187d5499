"""vog_tpu — TPU-native video object grounding with semantic roles.

A from-scratch JAX/XLA/Pallas/pjit framework functionally equivalent to the
PyTorch reference ``TheShadow29/vognet-pytorch`` (VOGNet, CVPR 2020,
ActivityNet-SRL).  See SURVEY.md at the repo root for the structural analysis
of the reference this build follows.

Reference-parity citation convention: docstrings cite reference files as
``code/foo.py §Symbol`` (upstream repo layout).  The reference mount was
empty during rounds so far; citations are reconstructed per SURVEY.md §0 and
flagged for a verification pass once the mount is populated.
"""

__version__ = "0.1.0"
