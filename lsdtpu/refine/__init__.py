from lsdtpu.refine.pose_graph import refine_trajectory

__all__ = ["refine_trajectory"]
