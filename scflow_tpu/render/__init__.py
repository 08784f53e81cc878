from scflow_tpu.render.ply import load_ply
from scflow_tpu.render.meshbank import MeshBank
from scflow_tpu.render.rasterizer import rasterize
from scflow_tpu.render.renderer import Renderer

__all__ = ["load_ply", "MeshBank", "rasterize", "Renderer"]
