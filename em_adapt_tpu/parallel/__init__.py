from em_adapt_tpu.parallel.mesh import MeshPlan, make_mesh

__all__ = ["MeshPlan", "make_mesh"]
