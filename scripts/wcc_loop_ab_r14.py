"""Interleaved wcc old(_loop r13)-vs-new(_loop r14) at a given SF."""
import importlib.util, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1]; reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false")
    .config("spark.driver.memory","24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from kafka_graphs_spark import datasets

def load_mod(name, path, injected=None):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m

# old components.py + old _loop.py, self-consistent from the r13 worktree
old_loop = load_mod("old_loop", "/tmp/r13head/kafka_graphs_spark/library/_loop.py")
import kafka_graphs_spark.library.components as new_comp
import kafka_graphs_spark.library._loop as new_loop
# build an old-components module bound to old_loop
spec = importlib.util.spec_from_file_location(
    "old_comp", "/tmp/r13head/kafka_graphs_spark/library/components.py")
old_comp = importlib.util.module_from_spec(spec)
sys.modules["old_comp"] = old_comp
# make its `from kafka_graphs_spark.library._loop import ...` hit old_loop
import kafka_graphs_spark.library as lib
saved = sys.modules["kafka_graphs_spark.library._loop"]
sys.modules["kafka_graphs_spark.library._loop"] = old_loop
try:
    spec.loader.exec_module(old_comp)
finally:
    sys.modules["kafka_graphs_spark.library._loop"] = saved

g = datasets.event_chain_graph(spark, sf_dir)
g.vertices.persist().count(); g.edges.persist().count()
new_comp.connected_components(g, max_iterations=500).count()  # warm-up
walls = {"old": [], "new": []}
for r in range(reps):
    for label, mod in (("old", old_comp), ("new", new_comp)):
        spark.sparkContext.setJobDescription(f"wcc-{label} rep{r}")
        t = time.time()
        mod.connected_components(g, max_iterations=500).count()
        walls[label].append(time.time() - t)
    print(f"rep {r}: old={walls['old'][-1]:.2f}s new={walls['new'][-1]:.2f}s", flush=True)
for k, v in walls.items():
    print(f"{k}: min={min(v):.2f} all=" + " ".join(f"{x:.2f}" for x in v), flush=True)
a = {r["id"]: r["value"] for r in old_comp.connected_components(g, max_iterations=500).collect()}
b = {r["id"]: r["value"] for r in new_comp.connected_components(g, max_iterations=500).collect()}
print("equality:", "OK" if a == b else "MISMATCH", len(a), flush=True)
spark.stop()
