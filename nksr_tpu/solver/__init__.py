from .pcg import pcg, solve_spd

__all__ = ["pcg", "solve_spd"]
