import pytest

from fashion_knowledge_graph_spark.operators.motif import motif_find

EDGES = [("a", "b", 1), ("b", "c", 2), ("a", "c", 3),
         ("c", "d", 4), ("b", "d", 5)]


@pytest.fixture(scope="module")
def edf(spark):
    return spark.createDataFrame(
        EDGES, "src string, dst string, weight int")


def test_chain_motif_matches_bruteforce(edf):
    got = {(r.x, r.y, r.z) for r in
           motif_find(edf, "(x)-[]->(y); (y)-[]->(z)").collect()}
    es = {(s, d) for s, d, _ in EDGES}
    want = {(x, y, z) for x, y in es for y2, z in es if y == y2}
    assert got == want and got  # b->c->d, a->b->c, a->b->d, a->c->d, b->c->d


def test_triangle_motif(edf):
    got = {(r.x, r.y, r.z) for r in motif_find(
        edf, "(x)-[]->(y); (y)-[]->(z); (x)-[]->(z)").collect()}
    assert got == {("a", "b", "c"), ("b", "c", "d")}


def test_negation_open_wedge(edf):
    # wedges x->y->z with NO closing x->z edge
    got = {(r.x, r.y, r.z) for r in motif_find(
        edf, "(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)").collect()}
    es = {(s, d) for s, d, _ in EDGES}
    want = {(x, y, z) for x, y in es for y2, z in es
            if y == y2 and (x, z) not in es}
    assert got == want and ("a", "b", "c") not in got


def test_named_edge_exports_attrs(edf):
    rows = motif_find(edf, "(x)-[e]->(y)").collect()
    assert {(r.x, r.y, r.e_weight) for r in rows} == set(EDGES)


def test_anonymous_vertex_unconstrained(edf):
    # out-neighbors of anything: anonymous source exports no column
    rows = motif_find(edf, "()-[]->(y)").collect()
    assert [list(r.asDict().keys()) for r in rows[:1]] == [["y"]]
    assert {r.y for r in rows} == {"b", "c", "d"}
    # duplicate edges multiply (join semantics): 5 edges -> 5 rows
    assert len(rows) == 5


def test_motif_validation_errors(edf):
    with pytest.raises(ValueError, match="disconnected"):
        motif_find(edf, "(a)-[]->(b); (c)-[]->(d)")
    with pytest.raises(ValueError, match="unparsable"):
        motif_find(edf, "(a)->(b)")
    with pytest.raises(ValueError, match="bound"):
        motif_find(edf, "(a)-[]->(b); !(a)-[]->(zz)")
    with pytest.raises(ValueError, match="anonymous"):
        motif_find(edf, "(a)-[]->(b); !(a)-[e]->(b)")
    with pytest.raises(ValueError, match="positive"):
        motif_find(edf, "!(a)-[]->(b)")
    with pytest.raises(ValueError, match="self-loop"):
        motif_find(edf, "(a)-[]->(a)")
