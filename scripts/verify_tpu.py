import jax, jax.numpy as jnp, numpy as np, time
print("devices:", jax.devices(), flush=True)
import orbslam3_tpu
from orbslam3_tpu.geometry import quat, SE3, Sim3
from orbslam3_tpu import imu as I

w = np.array([0.4, 0.1, -0.3], np.float32)
a_w = np.array([0.5, -0.2, 0.3], np.float32)
G = np.array([0, 0, -9.81], np.float32)
q0 = quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.3]))
n, hz = 200, 200.0
dt = 1.0/hz
acc = []
for i in range(n):
    qt = quat.mul(q0, quat.from_axis_angle(jnp.asarray(w)*(i*dt + dt/2)))
    Rt = np.asarray(quat.to_matrix(qt))
    acc.append(Rt.T @ (a_w - G))
acc = jnp.asarray(np.stack(acc)); gyro = jnp.tile(jnp.asarray(w), (n,1))
dts = jnp.full((n,), dt); mask = jnp.ones((n,), bool)

f = jax.jit(lambda g,a,d,m: I.integrate(g,a,d,m,jnp.zeros(3),jnp.zeros(3)))
t0=time.time(); st = jax.block_until_ready(f(gyro,acc,dts,mask)); t1=time.time()
st = jax.block_until_ready(f(gyro,acc,dts,mask)); t2=time.time()
print(f"preintegrate 200 samples on TPU: compile {t1-t0:.1f}s, steady {1e3*(t2-t1):.2f}ms", flush=True)

v0 = jnp.asarray([0.3,0.1,-0.2]); p0 = jnp.asarray([1.,2.,3.])
qj, vj, pj = I.propagate(st, q0, v0, p0)
v_true = v0 + jnp.asarray(a_w); p_true = p0 + v0 + 0.5*jnp.asarray(a_w)
print("v err:", float(jnp.abs(vj-v_true).max()), " p err:", float(jnp.abs(pj-p_true).max()))

T = SE3(quat.from_axis_angle(jnp.asarray([[0.3,-0.2,0.1]]*4)), jnp.asarray([[1.,2.,3.]]*4))
r = T.compose(T.inverse())
print("SE3 inv err:", float(jnp.abs(r.t).max()))
xi = jnp.asarray(np.random.default_rng(1).normal(size=(8,7))*0.4, jnp.float32)
g = jax.jit(lambda x: Sim3.exp(x).log())
print("Sim3 exp/log err on TPU:", float(jnp.abs(g(xi)-xi).max()))
rr = I.imu_residual(st, q0, v0, p0, qj, vj, pj, jnp.zeros(3), jnp.zeros(3))
print("residual at truth:", float(jnp.abs(rr).max()))
print("VERIFY_DONE")
