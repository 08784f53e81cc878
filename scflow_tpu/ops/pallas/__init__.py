from scflow_tpu.ops.pallas.rasterize import rasterize_packed_pallas

__all__ = ["rasterize_packed_pallas"]
