from emotts.ops.resblock import block_halo, fused_resblock1, resblock1_reference

__all__ = ["block_halo", "fused_resblock1", "resblock1_reference"]
