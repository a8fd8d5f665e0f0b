from .fad import LogMelEmbedder, compute_fad, fad_between_dirs, frechet_distance

__all__ = ["LogMelEmbedder", "compute_fad", "fad_between_dirs", "frechet_distance"]
