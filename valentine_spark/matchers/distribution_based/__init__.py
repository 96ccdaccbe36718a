from .matcher import DistributionBased

__all__ = ["DistributionBased"]
