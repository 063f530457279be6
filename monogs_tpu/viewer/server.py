"""Web viewer: live map rendering in the browser.

TPU-native replacement for the reference's Open3D GUI process
(/root/reference/viewer/slam_viewer.py:36-812): instead of an OS process with
an OpenGL context, a background thread serves an HTML page with orbit/fly
controls; every requested view is rendered with the SAME differentiable
rasterizer used for SLAM (the reference GUI likewise re-renders through its
CUDA rasterizer, slam_viewer.py:695-727). Shader modes mirror the reference
combo box (slam_viewer.py:226-231): rgb, depth, segmentation, time (kf-index
colormap); pause/resume is relayed back through a ViewerToMainPacket.

Zero extra dependencies: stdlib http.server + PNG via cv2.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .packets import LatestSlot, MainToViewerPacket, ViewerToMainPacket

_PAGE = """<!DOCTYPE html>
<html><head><title>monogs_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px}
img{display:block;margin:auto;image-rendering:pixelated}
button,select{background:#333;color:#ddd;border:1px solid #555;margin:2px}
</style></head><body>
<div id="hud">
  <div>frame <span id="fidx">-</span> | drag=orbit wheel=zoom shift-drag=pan</div>
  <select id="shader"><option>rgb</option><option>depth</option>
  <option>segmentation</option><option>time</option>
  <option>ellipsoids</option></select>
  <label><input type="checkbox" id="frusta" checked>frusta</label>
  <select id="kf"><option value="">live cam</option></select>
  <button id="pause">pause</button>
  <button id="follow">follow cam</button>
  <button id="shot">screenshot</button>
</div>
<img id="view" width="960">
<img id="inputs" width="960" style="opacity:0.9">
<script>
let yaw=0,pitch=0,dist=0,panx=0,pany=0,follow=true,paused=false,busy=false;
const img=document.getElementById('view');
function view_q(){
  const kf=document.getElementById('kf').value;
  const fr=document.getElementById('frusta').checked?1:0;
  return `yaw=${yaw}&pitch=${pitch}&dist=${dist}&panx=${panx}&pany=${pany}&follow=${follow?1:0}&frusta=${fr}&shader=${document.getElementById('shader').value}`+(kf?`&kf=${kf}`:'');
}
function refresh(){ if(busy) return; busy=true;
  fetch('/render?'+view_q()).then(r=>r.blob()).then(b=>{img.src=URL.createObjectURL(b);busy=false;});
  fetch('/state').then(r=>r.json()).then(s=>{
    document.getElementById('fidx').textContent=s.frame;
    const sel=document.getElementById('kf');
    const cur=sel.value;
    const want=[''].concat(s.kfs||[]);
    if(want.length!=sel.options.length){
      sel.innerHTML=want.map(k=>`<option value="${k}">${k===''?'live cam':'kf '+k}</option>`).join('');
      sel.value=cur;
    }});
  fetch('/input').then(r=>r.blob()).then(b=>{document.getElementById('inputs').src=URL.createObjectURL(b);});
}
setInterval(refresh, 250);
let drag=false,px=0,py=0;
img.onmousedown=e=>{drag=true;px=e.x;py=e.y;follow=false;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  if(e.shiftKey){panx+=(e.x-px)*0.003;pany+=(e.y-py)*0.003;}
  else{yaw+=(e.x-px)*0.005;pitch+=(e.y-py)*0.005;}
  px=e.x;py=e.y;};
img.onwheel=e=>{dist+=e.deltaY*0.002;e.preventDefault();follow=false;};
document.getElementById('pause').onclick=()=>{paused=!paused;fetch('/pause?on='+(paused?1:0));};
document.getElementById('follow').onclick=()=>{follow=true;yaw=pitch=dist=panx=pany=0;document.getElementById('kf').value='';};
document.getElementById('shot').onclick=()=>{fetch('/screenshot?'+view_q()).then(r=>r.json()).then(s=>alert('saved '+s.path));};
</script></body></html>"""


class ViewerServer:
    def __init__(self, render_fn, port: int = 8890, save_dir: str | None = None):
        """render_fn(pose_R, pose_t, shader, full=False) -> (H,W,3) float
        image in [0,1]; rendered with the SLAM rasterizer on the device.
        save_dir receives /screenshot captures (reference screenshot flow,
        slam_viewer.py:226-278 + save_gui utils)."""
        self.slot = LatestSlot()
        self.control = ViewerToMainPacket()
        self._render_fn = render_fn
        self._port = port
        self._save_dir = save_dir
        self._shot_count = 0
        self._httpd = None
        self._thread = None

    # -- SLAM-side API -------------------------------------------------------

    def push(self, packet: MainToViewerPacket):
        self.slot.put(packet)

    @property
    def paused(self) -> bool:
        return self.control.paused

    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code, body, ctype="text/html"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                if url.path == "/":
                    self._send(200, _PAGE.encode())
                elif url.path == "/state":
                    pkt = viewer.slot.get()
                    kfs = sorted(pkt.kf_poses.keys()) if (
                        pkt and pkt.kf_poses) else []
                    body = json.dumps(
                        {"frame": pkt.cur_frame_idx if pkt else -1,
                         "paused": viewer.control.paused,
                         "kfs": kfs}
                    ).encode()
                    self._send(200, body, "application/json")
                elif url.path == "/pause":
                    viewer.control.paused = q.get("on") == "1"
                    self._send(200, b"ok", "text/plain")
                elif url.path == "/render":
                    img = viewer._render_view(q)
                    self._send(200, img, "image/png")
                elif url.path == "/input":
                    img = viewer._input_view()
                    self._send(200, img, "image/png")
                elif url.path == "/screenshot":
                    body = viewer._screenshot(q)
                    self._send(200, body, "application/json")
                else:
                    self._send(404, b"not found")

        self._httpd = ThreadingHTTPServer(("0.0.0.0", self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()

    # -- rendering -----------------------------------------------------------

    def _orbit_pose(self, pkt, q):
        """Compose user orbit controls with the followed camera pose
        (reference free-view via the o3d scene camera, slam_viewer.py:731).
        `kf=<idx>` selects a keyframe's estimated pose as the base view
        (reference per-KF view select, slam_viewer.py:226-278)."""
        import jax.numpy as jnp

        from ..ops import lie

        R, t = pkt.cur_pose if pkt.cur_pose else (np.eye(3), np.zeros(3))
        kf = q.get("kf")
        if kf and pkt.kf_poses:
            try:
                R, t = pkt.kf_poses[int(kf)]
            except (KeyError, ValueError):
                pass
        elif q.get("follow") == "1":
            return np.asarray(R), np.asarray(t)
        yaw = float(q.get("yaw", 0.0))
        pitch = float(q.get("pitch", 0.0))
        dist = float(q.get("dist", 0.0))
        panx = float(q.get("panx", 0.0))
        pany = float(q.get("pany", 0.0))
        d_R = np.asarray(
            lie.so3_exp(jnp.array([pitch, yaw, 0.0], jnp.float32))
        )
        R2 = d_R @ np.asarray(R)
        t2 = d_R @ np.asarray(t) + np.array([panx, pany, dist])
        return R2, t2

    def _input_view(self) -> bytes:
        """Current input frame as rgb | jet-depth | segmentation strip
        (reference input widgets, slam_viewer.py:542-585)."""
        import cv2

        pkt = self.slot.get()
        if pkt is None or pkt.gt_rgb is None:
            blank = np.zeros((8, 8, 3), np.uint8)
            return cv2.imencode(".png", blank)[1].tobytes()
        rgb = (np.clip(np.asarray(pkt.gt_rgb), 0, 1) * 255).astype(np.uint8)
        panels = [cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)]
        if pkt.gt_depth is not None:
            d = np.asarray(pkt.gt_depth)
            dn = (255 * d / max(float(d.max()), 1e-6)).astype(np.uint8)
            panels.append(cv2.applyColorMap(dn, cv2.COLORMAP_JET))
        if pkt.gt_segmentation is not None:
            seg = np.asarray(pkt.gt_segmentation).astype(np.uint8)
            segn = (seg * (255 // max(int(seg.max()), 1))).astype(np.uint8)
            panels.append(cv2.applyColorMap(segn, cv2.COLORMAP_HSV))
        strip = np.concatenate(panels, axis=1)
        return cv2.imencode(".png", strip)[1].tobytes()

    def _render_view(self, q, full: bool = False) -> bytes:
        import cv2

        pkt = self.slot.get()
        if pkt is None or pkt.params is None:
            blank = np.zeros((16, 16, 3), np.uint8)
            ok, png = cv2.imencode(".png", blank)
            return png.tobytes()
        R, t = self._orbit_pose(pkt, q)
        img, view_intr = self._render_fn(
            R, t, q.get("shader", "rgb"), full=full
        )
        img8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        img8 = np.ascontiguousarray(img8)
        if q.get("frusta", "1") == "1":
            self._draw_frusta(img8, view_intr, np.asarray(R), np.asarray(t),
                              pkt)
        ok, png = cv2.imencode(".png", cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
        return png.tobytes()

    def _draw_frusta(self, img8, view_intr, Rv, tv, pkt):
        """Camera-frustum wireframes over the rendered view (reference
        slam_viewer.py:442-540): current estimate RED, ground truth GREEN,
        window keyframes CYAN. Host-side cv2 lines — the overlay costs no
        device work."""
        import cv2

        intr = pkt.intrinsics
        d = 0.12 * max(1.0, float(np.linalg.norm(np.asarray(tv))) or 1.0)
        hx = (intr.width * 0.5 / intr.fx) * d
        hy = (intr.height * 0.5 / intr.fy) * d
        corners_cam = np.array([
            [-hx, -hy, d], [hx, -hy, d], [hx, hy, d], [-hx, hy, d],
        ])

        def project(Xw):
            xc = Rv @ Xw + tv
            if xc[2] <= 0.02:
                return None
            return (
                int(round(view_intr.fx * xc[0] / xc[2] + view_intr.cx)),
                int(round(view_intr.fy * xc[1] / xc[2] + view_intr.cy)),
            )

        def draw_one(R, t, color, thick=1):
            R = np.asarray(R, np.float64)
            t = np.asarray(t, np.float64)
            C = -R.T @ t                    # camera center in world
            pts = [project(C)] + [
                project(R.T @ (c - t)) for c in corners_cam
            ]
            if any(p is None for p in pts):
                return
            for k in range(1, 5):
                cv2.line(img8, pts[0], pts[k], color, thick, cv2.LINE_AA)
                cv2.line(img8, pts[k], pts[1 + (k % 4)], color, thick,
                         cv2.LINE_AA)

        for idx, (R, t) in (pkt.kf_poses or {}).items():
            draw_one(R, t, (0, 220, 220))           # window KFs: cyan
        if pkt.gt_pose is not None:
            draw_one(*pkt.gt_pose, (0, 220, 0), 2)  # ground truth: green
        if pkt.cur_pose is not None:
            draw_one(*pkt.cur_pose, (255, 60, 60), 2)  # estimate: red

    def _screenshot(self, q) -> bytes:
        """Render the requested view at FULL sensor resolution and save it
        under <save_dir>/screenshots/ (reference screenshot flow)."""
        import os

        png = self._render_view(q, full=True)
        out_dir = os.path.join(self._save_dir or ".", "screenshots")
        os.makedirs(out_dir, exist_ok=True)
        self._shot_count += 1
        name = f"shot_{self._shot_count:04d}.png"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(png)
        return json.dumps({"path": path}).encode()


def make_render_fn(slam, max_width: int = 480):
    """Build a render_fn over a SLAM instance with the reference's shader
    modes (slam_viewer.py:695-727): segmentation colors and kf-index 'time'
    colormap override the per-Gaussian color before rasterization.
    Returns (image, view_intrinsics) so the server can overlay frusta."""
    import jax.numpy as jnp

    from ..models import gaussian_map as gm
    from ..ops.graphics import Intrinsics
    from ..ops.render import render

    def render_fn(R, t, shader="rgb", full=False):
        st = slam.state.gmap
        intr = slam.intr
        scale = 1.0 if full else min(1.0, max_width / intr.width)
        view_intr = Intrinsics(
            fx=intr.fx * scale, fy=intr.fy * scale,
            cx=intr.cx * scale, cy=intr.cy * scale,
            width=int(intr.width * scale), height=int(intr.height * scale),
        )
        p = st.params
        rgb = p["rgb"]
        opacity = gm.get_opacity(p)
        scales = gm.get_scales(p, slam.mcfg.isotropic)
        if shader == "ellipsoids":
            # Hard-surface ellipsoid mode (reference GL renderer analogue,
            # viewer/gl_render/*): opaque splats at ~1 sigma with a simple
            # normal-ish shading from the scale anisotropy.
            opacity = jnp.minimum(opacity * 4.0, 0.99)
            scales = scales * 0.5
            aniso = scales / (jnp.max(scales, axis=1, keepdims=True) + 1e-8)
            rgb = jnp.clip(rgb * (0.6 + 0.4 * aniso), 0.0, 1.0)
        if shader == "segmentation":
            k = st.obj_prob.shape[1]
            palette = jnp.asarray(
                np.random.RandomState(0).uniform(0.2, 1.0, (max(k, 1), 3))
            )
            rgb = st.obj_prob @ palette
        elif shader == "time":
            kf = st.kf_idx.astype(jnp.float32)
            kmax = jnp.maximum(jnp.max(kf), 1.0)
            tt = (kf / kmax)[:, None]
            rgb = tt * jnp.array([[1.0, 0.2, 0.1]]) + (1 - tt) * jnp.array(
                [[0.1, 0.3, 1.0]]
            )
        out = render(
            p["xyz"], scales, p["quats"], opacity, rgb,
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
            view_intr, active=st.active,
            tile_capacity=slam.mcfg.tile_capacity, max_dup=slam.mcfg.max_dup,
            backend=slam.mcfg.backend,
        )
        if shader == "depth":
            d = out.depth / jnp.maximum(jnp.max(out.depth), 1e-6)
            return jnp.stack([d, d, jnp.sqrt(d)], axis=-1), view_intr
        return out.rgb, view_intr

    return render_fn
