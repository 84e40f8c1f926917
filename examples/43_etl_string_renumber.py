"""ETL string-column renumbering (reference cpp/libcugraph_etl/
renumbering.cu + notebooks/algorithms/structure/Renumber-2.ipynb analog):
IP-address-style string endpoints → dense int32 ids → graph analytics →
results mapped back to the original strings.

Run:  python examples/43_etl_string_renumber.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

import cugraph_tpu as ct
from cugraph_tpu.etl import renumber_multi_columns, renumber_strings

rng = np.random.default_rng(0)
n_hosts, m = 500, 6000
ips = np.array([f"10.{a}.{b}.{c}" for a, b, c in
                rng.integers(0, 256, (n_hosts, 3))])
src_ip = ips[rng.integers(0, n_hosts, m)]
dst_ip = ips[rng.integers(0, n_hosts, m)]
flows = pd.DataFrame({"src_ip": src_ip, "dst_ip": dst_ip,
                      "bytes": rng.integers(64, 10**6, m)})
print(f"{m} flows between {len(np.unique(ips))} hosts")

renum, id_map = renumber_strings(flows, "src_ip", "dst_ip")
assert renum["src_ip"].dtype == np.int32
print(f"renumbered to int32 ids [0, {len(id_map)})")

G = ct.Graph(directed=True)
G.from_edgelist(renum["src_ip"].to_numpy(), renum["dst_ip"].to_numpy(),
                flows["bytes"].to_numpy().astype(np.float32))
pr = ct.pagerank(G).nlargest(5, "pagerank")
lut = dict(zip(id_map["id"], id_map["value"]))
print("top talkers by (bytes-weighted) pagerank:")
for r in pr.itertuples():
    print(f"  {lut[int(r.vertex)]:16s} {r.pagerank:.5f}")

# multi-column variant: (ip, port) composite endpoints
flows["src_port"] = rng.integers(1024, 65536, m).astype(str)
flows["dst_port"] = rng.integers(1024, 65536, m).astype(str)
renum2, map2 = renumber_multi_columns(
    flows, ["src_ip", "src_port"], ["dst_ip", "dst_port"])
print(f"(ip, port) composite renumber: {len(map2)} unique endpoints")
assert renum2.iloc[:, 0].max() < len(map2)
print("ETL renumbering OK")
