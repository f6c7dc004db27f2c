from basd_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

__all__ = ["jacobi_eigh"]
