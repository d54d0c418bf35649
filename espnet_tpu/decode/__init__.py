"""Search/inference: CTC greedy, batched beam search, scorer fusion."""
