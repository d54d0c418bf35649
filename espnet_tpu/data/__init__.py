"""Host-side data plane: Kaldi-free data dirs, tokenizers, bucketed batching."""
