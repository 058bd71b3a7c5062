from .codebook import nearest_codeword, nearest_codeword_xla

__all__ = ["nearest_codeword", "nearest_codeword_xla"]
