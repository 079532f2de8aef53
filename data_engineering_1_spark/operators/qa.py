"""QA layer: retrieval -> context formatting -> prompt -> LLM answer
(SURVEY.md §2.11 Q1-Q6).

Reproduces src/qa_system.py semantics with the network effect isolated
behind an injectable client callable — the HTTP call (Q3) is never part of
any correctness-checked path. The retrieval leg is the exact distributed
cosine top-k of ``operators.similarity`` (a deliberate upgrade over the
reference's approximate HNSW, SURVEY.md §2.4 E2).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedding import DEFAULT_DIM, hash_embed_texts
from .similarity import topk_by_cosine

# Q2: prompt templates, verbatim from src/qa_system.py:52-66 (including the
# reference's literal indentation — that is the exact string the model sees)
SYSTEM_PROMPT = """你是一个智能数据工程课程的助手。根据提供的参考文档回答用户问题。
        - 只使用提供的参考文档中的信息回答问题，不要使用其他知识。
        - 即使文档中没有直接明确标注主题的段落，也要从内容中提取和分析相关信息。
        - 当信息分散在多个文档中时，请综合分析并给出完整回答。
        - 如果问题涉及多方面内容，请尽量全面地从文档中找出相关信息进行回答。
        - 如果参考文档中完全没有相关信息，直接说明无法回答该问题，同时不需给出信息来源。
        - 回答要全面、准确，并始终在回答末尾注明信息来源（包括文档名、页码和段落）。
        - 如果使用了多个参考来源，请分别标明各个来源。"""

# NB: the indented "blank" lines carry 8 trailing spaces — exactly as the
# reference's f-string renders them
USER_PROMPT_TEMPLATE = (
    "参考文档：\n        {context}\n        \n        用户问题：{query}\n"
    "        \n        请根据以上参考文档回答问题，并在回答末尾注明信息来源："
)

NO_KEY_ANSWER = "错误: API密钥未设置。请设置API_KEY环境变量。"

CITATION_FMT = "[来源%d: 文档《%s》第%s页第%s段]"

# the LLM call's operational knobs (src/qa_system.py:78-89)
LLM_MODEL = "Qwen/Qwen2.5-72B-Instruct"
LLM_TEMPERATURE = 0.1
LLM_MAX_TOKENS = 2048
LLM_TIMEOUT_S = 120.0


def format_context_df(docs: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Q1 as a Spark plan: per (optional grouping), render every retrieved
    doc as ``[来源{rank}: 文档《{source}》第{page}页第{paragraph}段]\\n{text}\\n``
    and join in rank order with a newline (src/qa_system.py:22-39 — its
    '\\n'.join over parts that each end in '\\n' yields blank lines between
    entries).

    Expects columns: rank (1-based), source, page_number, paragraph_number,
    text. Rank order is preserved shuffle-safely by sorting the collected
    (rank, part) structs, not by relying on input order.
    """
    part = F.format_string(
        CITATION_FMT + "\n%s\n",
        F.col("rank"),
        F.col("source"),
        F.col("page_number"),
        F.col("paragraph_number"),
        F.col("text"),
    )
    with_part = docs.withColumn(
        "__rp", F.struct(F.col("rank").alias("r"), part.alias("p"))
    )
    agg = with_part.groupBy(*group_cols).agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list("__rp")), lambda s: s["p"])
        ).alias("context")
    )
    return agg


def format_context_rows(rows: list[dict[str, Any]]) -> str:
    """Q1 driver-side twin for small top-k results (identical output)."""
    parts = [
        CITATION_FMT % (i + 1, d.get("source", "Unknown"),
                        d.get("page_number", "Unknown"),
                        d.get("paragraph_number", "Unknown"))
        + f"\n{d['text']}\n"
        for i, d in enumerate(rows)
    ]
    return "\n".join(parts)


def build_user_prompt(context: str, query: str) -> str:
    """Q2 (src/qa_system.py:61-66)."""
    return USER_PROMPT_TEMPLATE.format(context=context, query=query)


def http_chat_client(api_key: str, base_url: str = "https://api.siliconflow.cn/v1"):
    """Q3: the reference's chat-completions call (src/qa_system.py:70-104)
    as a client factory. Requires httpx and a network — NEVER exercised by
    tests or declared queries; injected only in live deployments."""
    import httpx

    def call(system_prompt: str, user_prompt: str) -> str:
        payload = {
            "model": LLM_MODEL,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_prompt},
            ],
            "temperature": LLM_TEMPERATURE,
            "max_tokens": LLM_MAX_TOKENS,
            "stream": False,
        }
        headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {api_key}",
        }
        with httpx.Client(timeout=LLM_TIMEOUT_S) as client:
            resp = client.post(
                f"{base_url}/chat/completions", headers=headers, json=payload
            )
            resp.raise_for_status()
            return resp.json()["choices"][0]["message"]["content"]

    return call


def generate_answer(
    query: str,
    docs: list[dict[str, Any]],
    client: Callable[[str, str], str] | None,
) -> str:
    """Q3+Q6: build prompts, call the (injected) client, capture any
    exception as an error-string answer (src/qa_system.py:41-109)."""
    if client is None:
        return NO_KEY_ANSWER
    context = format_context_rows(docs)
    try:
        return client(SYSTEM_PROMPT, build_user_prompt(context, query))
    except Exception as e:  # error-as-value, reference :106-109
        return f"生成答案时出错: {str(e)}"


def answer_with_sources(
    spark: SparkSession,
    query: str,
    chunks: DataFrame,
    client: Callable[[str, str], str] | None = None,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    method: str = "exact",
    n_clusters: int = 16,
    nprobe: int = 4,
) -> dict[str, Any]:
    """Q4 (src/qa_system.py:111-138): embed the query, distributed
    top-k over the chunk table, then driver-side context/LLM composition.
    ``chunks`` must carry (id_col, text_col, vec_col [+ metadata cols]);
    ``similarity`` is plain cosine (reference: 1 - cosine_distance,
    src/vector_store.py:172 — the same number).

    ``method`` selects the retrieval plan (VERDICT r8 #8):

    - ``"exact"`` (default) — exact cosine top-k, a full corpus scan.
      Correctness gold standard; at 100 TB it reads every vector.
    - ``"ivf"`` — FAISS-style probed IVF over
      :func:`operators.similarity.ivf_topk_search`: vectors are
      coarse-bucketed into ``n_clusters`` (an existing ``label``
      column when present, else a deterministic hash of the id),
      per-label centroids are ranked against the query, and exact
      top-k runs over only the best ``nprobe`` clusters' members —
      a nprobe/n_clusters-sized slice of the corpus. nprobe governs
      recall exactly as in FAISS; ``nprobe >= n_clusters`` degenerates
      to exact search (pinned equal in tests). At 100 TB the
      assignment is a stored index column on the chunk table and the
      probe becomes a partition prune.

    ``dim`` is a parameter (default: the fixture embedding width) rather
    than a ``.first()`` sniff of the vector column — the only driver
    action here is the by-design collect of the k retrieved rows."""
    qvec = hash_embed_texts(pd.Series([query]), dim=dim)[0]
    qdf = spark.createDataFrame([(qvec,)], "query_vec array<float>")
    if method == "ivf":
        from .similarity import ivf_topk_search

        labeled = (
            chunks
            if "label" in chunks.columns
            else chunks.withColumn(
                "label",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_clusters)).cast(
                    "int"
                ),
            )
        )
        # the probed search keeps every payload column (text + metadata
        # ride along through the candidate semi-join into the final
        # top-k); only the synthesized bucket label is dropped when we
        # added it
        hits = ivf_topk_search(
            labeled,
            qdf,
            k=top_k,
            nprobe=min(nprobe, n_clusters),
            vec_col=vec_col,
            id_col=id_col,
        )
        if "label" not in chunks.columns:
            hits = hits.drop("label")
    elif method == "exact":
        hits = topk_by_cosine(
            chunks, qdf, k=top_k, vec_col=vec_col, id_col=id_col
        )
    else:
        raise ValueError(f"unknown retrieval method: {method!r}")
    hits = hits.withColumnRenamed("cosine_sim", "similarity")
    docs = [r.asDict() for r in hits.collect()]
    return {
        "query": query,
        "answer": generate_answer(query, docs, client),
        "sources": [
            {
                "text": d[text_col],
                "metadata": {
                    k: v
                    for k, v in d.items()
                    if k not in (text_col, vec_col, "similarity")
                },
                "similarity": d["similarity"],
            }
            for d in docs
        ],
    }
