from vsr_tpu.io.nifti import load_nifti, save_nifti, NiftiHeader  # noqa: F401
