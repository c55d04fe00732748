// Settings.tsx: theme, session info, deployed model parameters, sign-out.
import {api, h, main, esc, USER, logout, toast} from "/static/app.js";

export default async function Settings() {
  const me = await api("/api/auth/me");
  main.append(h(`<div class="panel"><h2>Session</h2><div class="kv">
      <span class="dim">user</span><b>${esc(me.username)}</b>
      <span class="dim">email</span><b>${esc(me.email || "—")}</b>
      <span class="dim">role</span><b>${esc(me.role)}</b>
      <span class="dim">rater tier</span><b>${esc(me.rater_tier || "—")}</b>
      <span class="dim">member since</span><b>${esc((me.created_at || "").slice(0, 10))}</b>
    </div>
    <div class="row" style="margin-top:10px">
      <button class="ghost" id="theme">Toggle light/dark</button>
      <button class="ghost" id="refresh">Refresh token</button>
      <button class="mini" id="out">Sign out</button></div></div>
  <div class="panel"><h2>Change password</h2>
    <div class="row"><input id="pw0" placeholder="current password"
        type="password">
      <input id="pw1" placeholder="new password" type="password">
      <button class="action" id="pwgo">Change</button></div></div>
  <div class="panel"><h2>About</h2>
    <div class="dim">lameness-tpu admin — a dependency-free ES-module SPA
      over the same REST/WS contract the reference's React frontend used
      (admin-interface/frontend). All pages talk to /api/* and
      /api/ws/*.</div></div>`));

  document.getElementById("theme").onclick = () => {
    const cur = document.documentElement.dataset.theme === "light"
      ? "" : "light";
    document.documentElement.dataset.theme = cur;
    localStorage.setItem("theme", cur);
  };
  document.getElementById("refresh").onclick = async () => {
    try {
      const r = await api("/api/auth/refresh", {method: "POST"});
      localStorage.setItem("token", r.access_token);
      toast("token refreshed");
    } catch (e) { toast(e.message, "bad"); }
  };
  document.getElementById("out").onclick = logout;
  document.getElementById("pwgo").onclick = async () => {
    const cur = document.getElementById("pw0").value;
    const nw = document.getElementById("pw1").value;
    if (!cur || !nw) return toast("both fields required", "warn");
    try {
      await api("/api/auth/password",
                {method: "PUT",
                 json: {current_password: cur, new_password: nw}});
      toast("password changed");
    } catch (e) { toast(e.message, "bad"); }
  };
}
