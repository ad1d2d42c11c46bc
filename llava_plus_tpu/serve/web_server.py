"""Web chat UI + HTTP API (gradio-free).

Replaces the reference's ``gradio_web_server.py`` / ``_llava_plus.py`` UIs
with a self-contained aiohttp app: a single-page chat frontend (image
upload, model dropdown, temperature/top-p, streaming) and a JSON API that
proxies the controller topology. ``--llava-plus`` enables the tool-use loop
(two rounds + annotated result image) through ``orchestrator.py``.

Conversation/vote logs keep the reference's JSONL audit format
(ref gradio_web_server_llava_plus.py:726-737).
"""

from __future__ import annotations

import argparse
import base64
import datetime
import json
import os
import time
from io import BytesIO

from llava_plus_tpu.constants import LOGDIR
from llava_plus_tpu.conversation import conv_templates
from llava_plus_tpu.serve.orchestrator import (
    ToolOrchestrator,
    ToolSession,
    get_worker_addr,
)
from llava_plus_tpu.utils.logging import build_logger

logger = build_logger("web_server", "web_server.log")

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>LLaVA-Plus (TPU)</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:860px;margin:24px auto;padding:0 12px}
 #chat{border:1px solid #ccc;border-radius:8px;min-height:320px;padding:12px;
       white-space:pre-wrap;overflow-y:auto;max-height:55vh}
 .u{color:#125;font-weight:600;margin-top:8px}.a{color:#161;margin:4px 0}
 .row{display:flex;gap:8px;margin-top:10px}
 textarea{flex:1;height:60px} button{padding:6px 14px}
 img.result{max-width:320px;display:block;margin:6px 0;border-radius:6px}
 .ctl{display:flex;gap:16px;align-items:center;margin:8px 0;font-size:13px}
</style></head><body>
<h2>LLaVA-Plus <small>(TPU-native)</small></h2>
<div class="ctl">
 <label>Model <select id="model"></select></label>
 <label>Temp <input id="temp" type="range" min="0" max="1" step="0.1" value="0.2">
  <span id="tempv">0.2</span></label>
 <label>Top-p <input id="topp" type="range" min="0" max="1" step="0.05" value="0.7">
  <span id="toppv">0.7</span></label>
 <label>Image <input id="img" type="file" accept="image/*"></label>
</div>
<div id="chat"></div>
<div class="row"><textarea id="msg" placeholder="Ask about the image..."></textarea>
<button id="send">Send</button><button id="clear">Clear</button></div>
<script>
const chat = document.getElementById('chat');
let history = [];
temp.oninput = () => tempv.textContent = temp.value;
topp.oninput = () => toppv.textContent = topp.value;
fetch('/api/models', {method:'POST'}).then(r=>r.json()).then(d=>{
  for (const m of d.models) { const o=document.createElement('option');
    o.textContent=m; model.appendChild(o); }
});
function add(cls, text){const d=document.createElement('div');d.className=cls;
  d.textContent=text;chat.appendChild(d);chat.scrollTop=chat.scrollHeight;return d;}
async function fileB64(f){return new Promise(res=>{const r=new FileReader();
  r.onload=()=>res(r.result.split(',')[1]);r.readAsDataURL(f);});}
send.onclick = async () => {
  const text = msg.value.trim(); if(!text) return;
  msg.value=''; add('u','You: '+text);
  const body = {model: model.value, text, history,
    temperature: parseFloat(temp.value), top_p: parseFloat(topp.value)};
  if (img.files[0]) body.image = await fileB64(img.files[0]);
  const out = add('a','...');
  const resp = await fetch('/api/chat', {method:'POST',
    headers:{'Content-Type':'application/json'}, body: JSON.stringify(body)});
  const reader = resp.body.getReader(); const dec = new TextDecoder();
  let buf='';
  for(;;){const {done,value} = await reader.read(); if(done) break;
    buf += dec.decode(value,{stream:true});
    const parts = buf.split('\\0'); buf = parts.pop();
    for(const p of parts){ if(!p) continue; const d = JSON.parse(p);
      if(d.text !== undefined) out.textContent = d.text;
      if(d.image){const im=document.createElement('img');im.className='result';
        im.src='data:image/png;base64,'+d.image;chat.appendChild(im);}
    }}
  history.push([text, out.textContent]);
};
clear.onclick = () => {chat.innerHTML=''; history=[]; img.value='';};
</script></body></html>"""


def log_conversation(kind: str, payload: dict):
    os.makedirs(LOGDIR, exist_ok=True)
    name = datetime.datetime.now().strftime("%Y-%m-%d") + "-conv.json"
    with open(os.path.join(LOGDIR, name), "a") as f:
        f.write(json.dumps({"tstamp": time.time(), "type": kind, **payload}) + "\n")


def build_app(controller_addr: str, llava_plus: bool = False,
              conv_mode: str = "v1", moderate: bool = False):
    from aiohttp import web

    orch = ToolOrchestrator(controller_addr)

    routes = web.RouteTableDef()

    @routes.get("/")
    async def index(request):
        return web.Response(text=INDEX_HTML, content_type="text/html")

    @routes.post("/api/models")
    async def models(request):
        import requests as rq

        try:
            r = rq.post(controller_addr + "/list_models", timeout=5)
            return web.json_response({"models": sorted(r.json()["models"])})
        except Exception:
            return web.json_response({"models": []})

    @routes.post("/api/chat")
    async def chat(request):
        import asyncio

        data = await request.json()
        if moderate:
            from llava_plus_tpu.utils.logging import moderation_msg
            from llava_plus_tpu.utils.misc import violates_moderation

            if violates_moderation(data.get("text", "")):
                log_conversation("flagged", {"text": data.get("text", "")})
                return web.json_response({"error": moderation_msg})
        resp = web.StreamResponse()
        await resp.prepare(request)
        loop = asyncio.get_event_loop()

        def run():
            chunks = []

            conv = conv_templates[conv_mode].copy()
            for u, a in data.get("history", []):
                conv.append_message(conv.roles[0], u)
                conv.append_message(conv.roles[1], a)

            image = None
            if data.get("image"):
                from PIL import Image

                image = Image.open(
                    BytesIO(base64.b64decode(data["image"]))
                ).convert("RGB")

            gen_params = dict(
                temperature=data.get("temperature", 0.2),
                top_p=data.get("top_p", 0.7),
                max_new_tokens=data.get("max_new_tokens", 512),
                stop=conv.sep2 or conv.sep,
            )
            try:
                if llava_plus:
                    session = ToolSession()
                    result = orch.run_turn(
                        conv, data["model"], data["text"], image=image,
                        session=session, **gen_params,
                    )
                    chunks.append({"text": result.text})
                    if result.annotated_image is not None:
                        buf = BytesIO()
                        result.annotated_image.save(buf, format="PNG")
                        chunks.append({
                            "image": base64.b64encode(buf.getvalue()).decode()
                        })
                else:
                    text = data["text"]
                    if image is not None and not data.get("history"):
                        text = "<image>\n" + text
                    conv.append_message(conv.roles[0], text)
                    conv.append_message(conv.roles[1], None)
                    image_b64 = data.get("image")
                    last = ""
                    for last in orch.stream_model(
                        data["model"], conv.get_prompt(),
                        [image_b64] if image_b64 else None, **gen_params,
                    ):
                        chunks.append({"text": last})
                log_conversation("chat", {
                    "model": data.get("model"), "text": data.get("text"),
                })
            except Exception as e:
                chunks.append({"text": f"error: {e}", "error_code": 1})
            return chunks

        # run the blocking loop in an executor, stream chunks as produced
        chunks = await loop.run_in_executor(None, run)
        for c in chunks:
            await resp.write(json.dumps(c).encode() + b"\0")
        await resp.write_eof()
        return resp

    @routes.post("/api/vote")
    async def vote(request):
        data = await request.json()
        log_conversation(data.get("type", "vote"), data)
        return web.json_response({})

    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.add_routes(routes)
    return app


def main():
    from aiohttp import web

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--controller-url", type=str,
                        default="http://localhost:21001")
    parser.add_argument("--llava-plus", action="store_true",
                        help="enable the tool-use orchestration loop")
    parser.add_argument("--conv-mode", type=str, default="v1")
    parser.add_argument("--moderate", action="store_true",
                        help="gate user input through the OpenAI moderation "
                             "endpoint (ref gradio_web_server --moderate)")
    args = parser.parse_args()
    logger.info(f"args: {args}")
    web.run_app(
        build_app(args.controller_url, args.llava_plus, args.conv_mode,
                  moderate=args.moderate),
        host=args.host, port=args.port,
    )


if __name__ == "__main__":
    main()
