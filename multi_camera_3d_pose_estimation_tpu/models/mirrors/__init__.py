"""Independent torch mirrors of the MMPose model families.

These register modules in MMPose's construction order, so their
``state_dict()`` has exactly the key names and insertion order of a real
MMPose checkpoint (`/root/reference/examples/model_paths.yaml:8-18`'s
`.pth` surface).  Two jobs:

1. Test oracles: `tests/test_torch_parity.py` converts their randomized
   checkpoints through `models.convert` and pins forward agreement.
2. The `convert --verify` drill (`models.checkpoint_verify`): a real
   checkpoint is loaded into BOTH the mirror (torch semantics) and our
   flax model (through the converter), and the forwards are compared
   per stage — catching a shared misunderstanding that end-to-end
   self-tests cannot.

torch is imported lazily (CPU-only deserialization/forwards).
"""
