from cppf2_tpu.models.layers import ResLayer, ResMLP
from cppf2_tpu.models.cppf import ShotBranch, DinoBranch, TuplePredictions

__all__ = ["ResLayer", "ResMLP", "ShotBranch", "DinoBranch", "TuplePredictions"]
