"""End-to-end demo: the full reference pipeline on bundled fixtures.

Mirrors reference scripts/run_pipeline.sh as ONE Spark driver program:
mesh → pubtator → pubmed → merge_filter → LLM classify (stub) →
finalize → TSV release + provenance. Run:

    python examples/run_reference_pipeline.py /tmp/demo_out

Swap `llm.stub_classifier` for `llm.openai_classifier_factory()` and
`rest.stub_fetcher_factory` for `rest.pubchem_chembl_fetcher_factory()`
to go live (keys/network permitting) — the plan is identical.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aurora_mito_etl_spark.operators import chem, llm, rest
from aurora_mito_etl_spark.pipeline import finalize, merge_filter, mesh, pubmed, pubtator
from aurora_mito_etl_spark.schema import validate
from aurora_mito_etl_spark.session import get_spark
from aurora_mito_etl_spark.sources import sinks

PUBMED_XML = """<?xml version='1.0'?><PubmedArticleSet>
<PubmedArticle><MedlineCitation><PMID Version="1">2001</PMID>
<DateCompleted><Year>2018</Year></DateCompleted>
<Article><ArticleTitle>Metformin impairs mitochondrial complex I</ArticleTitle>
<Abstract><AbstractText>We report that metformin inhibits mitochondrial complex I in hepatocytes.</AbstractText></Abstract></Article>
</MedlineCitation></PubmedArticle>
<PubmedArticle><MedlineCitation><PMID Version="1">2002</PMID>
<DateCompleted><Year>2021</Year></DateCompleted>
<Article><ArticleTitle>Novel quinazoline blocks NADH:ubiquinone oxidoreductase</ArticleTitle>
<Abstract><AbstractText>Compound QZ-17 decreases NADH:ubiquinone oxidoreductase activity, i.e. mitochondrial complex I.</AbstractText></Abstract></Article>
</MedlineCitation></PubmedArticle>
</PubmedArticleSet>"""

MESH_DESC = """<?xml version='1.0'?><DescriptorRecordSet>
<DescriptorRecord><DescriptorUI>D008687</DescriptorUI>
<DescriptorName><String>Metformin</String></DescriptorName>
<TreeNumberList><TreeNumber>D02.078.370.141.450</TreeNumber></TreeNumberList></DescriptorRecord>
</DescriptorRecordSet>"""

MESH_SUPP = """<?xml version='1.0'?><SupplementalRecordSet>
<SupplementalRecord SCRClass="1"><SupplementalRecordUI>C123456</SupplementalRecordUI>
<SupplementalRecordName><String>QZ-17</String></SupplementalRecordName>
<RegistryNumber></RegistryNumber></SupplementalRecord>
</SupplementalRecordSet>"""

PUBTATOR = "\n".join(
    [
        "2001\tChemical\tMESH:D008687\tmetformin\tr",
        "2002\tChemical\tMESH:C123456\tQZ-17\tr",
    ]
)


def main(out_dir: str) -> None:
    # demo-sized data → few shuffle partitions (engine default is 32)
    spark = get_spark(app_name="reference-pipeline-demo", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="aurora_demo_")
    with gzip.open(os.path.join(work, "pubmed26n0001.xml.gz"), "wt") as f:
        f.write(PUBMED_XML)
    open(os.path.join(work, "desc.xml"), "w").write(MESH_DESC)
    open(os.path.join(work, "supp.xml"), "w").write(MESH_SUPP)
    with gzip.open(os.path.join(work, "pubtator.gz"), "wt") as f:
        f.write(PUBTATOR + "\n")

    # 1-3. staging scans + keep-logic
    bio, tags = mesh.process_mesh(
        spark, os.path.join(work, "desc.xml"), os.path.join(work, "supp.xml")
    )
    pmids = pubtator.process_pubtator(spark, os.path.join(work, "pubtator.gz"), tags)
    abstracts = pubmed.process_pubmed(spark, work, year_min=2000)
    print("mesh_bioactive:", validate(bio, "mesh_bioactive"))
    print("abstracts:", abstracts.count())

    # 4. merge + final topical filter
    filtered = merge_filter.merge_and_filter(
        abstracts, inhibitor_names=["rotenone", "piericidin"], pubtator_pmids=pmids
    )

    # 5. classify (stub — plug a live client here)
    classified = llm.classify_documents(filtered, llm.stub_classifier)
    print("pubmed_gpt:", validate(classified, "pubmed_gpt"))

    # 6. finalize → 18-column release
    refs = finalize.ReferenceData(
        known_inhibitors=["Rotenone", "Piericidin", "Bongkrekic"],
        blacklist_raw=["*mitochondr*"],
        typo_pairs=[("analogs", ""), ("analog", "")],
        smiles_db={"Metformin": "CN(C)C(=N)NC(=N)N"},
        panel_smiles={"metformin": "CN(C)C(=N)NC(=N)N"},
        biguanide_refs={"biguanide": "NC(=N)NC(=N)N", "biguanide_motif": "NC(=N)N"},
    )
    new_rows, all_rows = finalize.build_release(
        classified, refs, spark,
        fetcher_factory=rest.stub_fetcher_factory({}),
        backend_factory=chem.default_backend,
    )

    # materialize each artifact once (cache before the double use)
    all_rows = all_rows.cache()
    date = "2026-08-13"
    p_new = sinks.overwrite_release(new_rows, out_dir, "new_inhibitors.tsv", date)
    p_all = sinks.overwrite_release(all_rows, out_dir, "all_inhibitors.tsv", date)
    prov = os.path.join(out_dir, "release_info.jsonl")
    for path, step in ((p_new, "finalize:new"), (p_all, "finalize:all")):
        sinks.write_provenance(prov, path, step, sources=["pubmed", "mesh", "pubtator"], date=date)
    print("release written:")
    for row in all_rows.collect():
        print(" ", row["compound"], row["pubmed_references"], row["known_status"],
              row["confidence_pubmed"], row["SMILES"][:30])
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="aurora_release_"))
