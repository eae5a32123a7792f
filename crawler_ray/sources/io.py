"""Table IO: Lance when available, parquet otherwise.

The north rule targets Lance tables for the interleaved documents; the
``lance``/``lancedb`` packages are not installed in this environment,
so every writer/reader gates on an import-try and falls back to
parquet with the identical schema.  Call sites use these helpers, so
switching the storage format is a no-op for pipeline code.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

try:  # pragma: no cover - not installed in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(ds: Dataset, path: str, mode: str = "overwrite") -> str:
    """Write a Dataset as a Lance dataset (if available) or a parquet
    directory.  Returns the path written."""
    if HAVE_LANCE:
        ds.write_lance(path, mode=mode)  # ray.data has a native Lance sink
        return path
    ds.write_parquet(path)
    return path


def read_table(path: str, columns: list[str] | None = None) -> Dataset:
    if HAVE_LANCE and os.path.isdir(path) and path.endswith(".lance"):
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_arrow(table: pa.Table, path: str) -> str:
    """Driver-side small-table writer (seeds, fixtures, metrics)."""
    if HAVE_LANCE:
        lance.write_dataset(table, path, mode="overwrite")
        return path
    pq.write_table(table, path if path.endswith(".parquet") else path + ".parquet")
    return path


def write_jsonl(ds: Dataset, path: str) -> str:
    """JSONL sink — line-delimited JSON, one object per row (the
    reference's crawled-doc output format is JSON files per page:
    src/crawler/integrated_crawler.py's json.dump sink).  Parquet is
    the performance format; this is the interchange format.  Ray
    writes one .json file per block, so the output stays partitioned
    and a downstream read parallelizes."""
    ds.write_json(path)
    return path


def read_jsonl(path: str, **kw) -> Dataset:
    """JSONL source: line-delimited JSON files/dirs → Dataset (arrow
    type inference per block)."""
    return rd.read_json(path, **kw)


def compact_parquet(
    input_dir: str, output_dir: str, target_rows_per_file: int = 500_000
) -> int:
    """Compact a directory of many small parquet files (e.g. per-wave
    crawl partitions) into few large ones — the post-crawl maintenance
    step that keeps downstream scans from drowning in file-open
    overhead.  Returns the row count written."""
    ds = rd.read_parquet(input_dir)
    n = ds.count()
    try:
        ds.write_parquet(output_dir, min_rows_per_file=target_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(output_dir, num_rows_per_file=target_rows_per_file)
    return n


def read_seeds(path: str) -> pa.Table:
    """Seed table reader: parquet/Lance; Excel (the reference's
    ``input/prompt.xlsx`` format) when pandas+openpyxl are available."""
    if path.endswith((".xlsx", ".xls")):
        try:
            import pandas as pd

            df = pd.read_excel(path, engine="openpyxl")
        except ImportError as e:  # openpyxl not installed here
            raise NotImplementedError(
                "Excel seed reading requires openpyxl; convert the seed "
                "list to parquet (FIXTURES.md F1 schema) instead"
            ) from e
        from crawler_ray.functions.urls import create_site_identifier

        url_col = next((c for c in df.columns if "주소" in str(c)), None)
        name_col = next((c for c in df.columns if "기관" in str(c) or "회사" in str(c)), None)
        prompt_col = next((c for c in df.columns if "내용" in str(c)), None)
        if not all([url_col, name_col, prompt_col]):
            raise ValueError("seed xlsx missing required columns")
        rows = {
            "site_identifier": [],
            "site_name": [],
            "base_url": [],
            "instruction_prompt": [],
            "max_pages": [],
            "crawl_delay": [],
        }
        for _, r in df.iterrows():
            base_url = r[url_col]
            if isinstance(base_url, str) and base_url.startswith("http"):
                rows["site_identifier"].append(create_site_identifier(base_url))
                rows["site_name"].append(str(r[name_col]))
                rows["base_url"].append(base_url)
                rows["instruction_prompt"].append(str(r[prompt_col]))
                rows["max_pages"].append(50)
                rows["crawl_delay"].append(1.0)
        from crawler_ray.schemas import SEEDS

        return pa.table(rows, schema=SEEDS)
    return pq.read_table(path)
