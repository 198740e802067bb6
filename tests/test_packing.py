

def test_chunk_tokens_windows(spark):
    """Sliding-window chunking: full coverage, end-aligned last window,
    no tiny tails, short/NULL docs preserved."""
    from teleharvest_spark.operators.packing import chunk_tokens

    rows = [
        (0, list(range(10))),   # 10 tokens
        (1, [7, 8]),            # shorter than chunk_len
        (2, None),              # NULL -> one empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")

    got = {
        (r["doc_id"], r["chunk_id"]): (r["tokens"], r["n_tok"])
        for r in chunk_tokens(df, chunk_len=4).collect()
    }
    assert got[(0, 0)] == ([0, 1, 2, 3], 4)
    assert got[(0, 1)] == ([4, 5, 6, 7], 4)
    assert got[(0, 2)] == ([6, 7, 8, 9], 4)   # end-aligned, overlap 2
    assert got[(1, 0)] == ([7, 8], 2)
    assert got[(2, 0)] == ([], 0)
    assert len(got) == 5

    # stride < chunk_len: overlapping windows, still end-aligned
    overlapped = {
        r["chunk_id"]: r["tokens"]
        for r in chunk_tokens(df.where("doc_id = 0"), chunk_len=4, stride=2).collect()
    }
    assert overlapped == {
        0: [0, 1, 2, 3], 1: [2, 3, 4, 5], 2: [4, 5, 6, 7], 3: [6, 7, 8, 9],
    }

    # exact multiple: disjoint windows, no duplicate end window
    exact = {
        r["chunk_id"]: r["tokens"]
        for r in chunk_tokens(
            spark.createDataFrame([(9, list(range(8)))], "doc_id long, tokens array<int>"),
            chunk_len=4,
        ).collect()
    }
    assert exact == {0: [0, 1, 2, 3], 1: [4, 5, 6, 7]}
