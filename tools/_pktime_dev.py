import sys; sys.path.insert(0, "/root/repo")
import os, functools, time
import jax, jax.numpy as jnp
from mgpoisson.core.spec import Spec
from mgpoisson.core.rhs import point_charge_rhs, initial_guess
from mgpoisson.cycle.vcycle import make_cycle
from mgpoisson.cycle import packed as PK
from mgpoisson.bench.timing import chain_time
n=4096
spec = Spec(size=n, scheme="fast")
f = point_charge_rhs(n, 2, jnp.float32)
h = spec.fine_h
u0 = initial_guess(f)
kt = functools.partial(chain_time, k1=20, k2=120, tries=5)
print("start", time.time(), flush=True)
_p = PK.make_packed_cycle(spec)
fp = PK.pack(f); up0 = PK.pack(u0)
t_pk = kt(lambda u, ff: _p(u, ff, h), up0, consts=(fp,))
print("packed   fast vcycle ms:", round(t_pk*1e3, 4), flush=True)
_r = make_cycle(spec)
t_ref = kt(lambda u, ff: _r(u, ff, h), u0, consts=(f,))
print("unpacked fast vcycle ms:", round(t_ref*1e3, 4), flush=True)
_pr = PK.make_packed_cycle(spec, rnorm=True)
t_pkr = kt(lambda u, ff: _pr(u, ff, h)[0], up0, consts=(fp,))
print("packed   fast vcycle+rnorm ms:", round(t_pkr*1e3, 4), flush=True)
