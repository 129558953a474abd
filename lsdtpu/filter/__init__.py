from lsdtpu.filter.ukf import RESET_P, RESET_X, ukf_step

__all__ = ["RESET_P", "RESET_X", "ukf_step"]
