"""Deterministic synthetic transcript fixtures (FIXTURES.md §1).

Generates the primary input table ``(conv_id, turn_idx, role, text, tool,
ts)`` with the content mix modeled on the reference's 18-persona mock corpus
(/root/reference/test-data/mock-resumes/) and its unit-test inputs: clean
ja/en dialogue, one turn per PII pattern family, false-positive traps,
quality-drop turns, and structured tool output.  Fixed seed, no external
data, no wall-clock reads (timestamps derive from the seed).

A few conversations are "hot" (many times the average turn count) to
exercise salted repartitioning at scale.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta

import pandas as pd

SCHEMA_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_SURNAME_POOL = ["田中", "佐藤", "鈴木", "高橋", "山田", "渡辺", "伊藤", "中村",
                 "小林", "加藤", "吉田", "山本", "佐々木", "松本", "井上", "木村"]
_GIVEN_POOL = ["太郎", "花子", "健太", "翔太", "美咲", "由美子", "慎一", "直樹",
               "陽菜", "結衣", "大輝", "和也", "さくら", "誠", "隆", "優子"]
_KANA_POOL = ["タナカ タロウ", "サトウ ハナコ", "スズキ ケンタ", "ヤマダ ミサキ",
              "タカハシ ユイ", "ワタナベ マコト"]
_ADDR_POOL = [
    "東京都渋谷区神宮前3-14-5 メゾンド原宿 402号室",
    "北海道札幌市中央区大通西4丁目6-1",
    "京都府京都市下京区四条烏丸1-5-3",
    "大阪府大阪市北区梅田2-5-10",
    "神奈川県横浜市西区みなとみらい2-3-1",
    "千葉県船橋市本町5-7-3 コーポ本町201号室",
]
_CLEAN_JA = [
    "承知しました。それでは次のステップに進みましょう。",
    "この処理の実行結果を確認したところ、期待通りの出力が得られました。",
    "来週の打ち合わせの日程を調整したいのですが、ご都合はいかがでしょうか。",
    "ログを確認してから改めてご連絡いたしますので、少々お待ちください。",
    "障害の原因は設定ファイルの誤りによるものと判明しました。修正済みです。",
    "ご指摘いただいた点を修正し、最新版を共有フォルダに保存しました。",
    "売上の集計結果をまとめたレポートを作成しました。前年比で約一割の増加です。",
    "システムの保守作業のため、明日の午前二時からサービスを停止いたします。",
    "新しい機能の実装方針について、設計書をもとに話し合いを行いました。",
    "環境の変化に対応するためには、継続的な学習と柔軟な発想が求められます。",
]
_CLEAN_EN = [
    "Sounds good, let me know when the fix is deployed and I will verify the results.",
    "The executor lost its heartbeat after the shuffle fetch failed, so we should retry.",
    "Could you send me the updated schedule for next week before the review meeting?",
    "After reviewing the quarterly numbers the team agreed to shift budget toward tooling.",
    "Installation is straightforward: download the package, run the setup script, restart.",
    "There was a small typo in the configuration file which caused the deployment to fail.",
    "In general you should prefer built-in functions because they are faster to maintain.",
    "The new model performs better on long documents thanks to the larger context window.",
]
_FP_TRAPS = [
    "在籍期間：2020年4月 - 2024年3月 株式会社テックフロンティアに勤務。",
    "作成日：2024年12月1日 この資料は社外秘です。",
    "2024年12月1日 に定例会議を開催します。議題は後日共有します。",
    "募集職種：フロントエンドエンジニア（React、TypeScript経験者歓迎）",
    "プロジェクト期間は 2021年 - 2023年 の予定で進行しました。",
]
_DROP_TURNS = [
    "",
    "   \n\t  ",
    "OK",
    "了解",
    "ã\x81\x93ã\x82\x93ã\x81«ã\x81¡ã\x81¯ä¸\x96ç\x95\x8cã\x81®çªã\x81§ã\x81\x99ã\x81\xadã\x81\x84ã\x81\x86",
    "買って買って買って買って買って買って買って買って買って買って買って買って",
    "!!!###$$$%%%^^^&&&***((()))!!!###$$$%%%^^^&&&***((())) wow",
    "bonjour pouvez vous verifier les journaux encore une fois s'il vous plait merci beaucoup",
]
_TOOLS = ["search", "file_read", "code_exec", "db_query"]


def _pii_turn(rng: random.Random, variant_level: int = 1) -> str:
    sn, gn = rng.choice(_SURNAME_POOL), rng.choice(_GIVEN_POOL)
    kana = rng.choice(_KANA_POOL)
    sep = rng.choice([" ", "　", ""])
    addr = rng.choice(_ADDR_POOL)
    email = f"{rng.choice(['tanaka','sato','suzuki','yamada'])}.{rng.choice(['taro','hana','ken'])}{rng.randint(1,99)}@example.com"
    phone = rng.choice([
        f"090-{rng.randint(1000,9999)}-{rng.randint(1000,9999)}",
        f"03-{rng.randint(1000,9999)}-{rng.randint(1000,9999)}",
        f"(045) {rng.randint(100,999)}-{rng.randint(1000,9999)}",
    ])
    postal = f"〒{rng.randint(100,999)}-{rng.randint(1000,9999):04d}"
    birthday = rng.choice([
        f"19{rng.randint(60,99)}年{rng.randint(1,12)}月{rng.randint(1,28)}日",
        f"昭和{rng.randint(40,63)}年{rng.randint(1,12)}月{rng.randint(1,28)}日",
        f"平成{rng.randint(1,10)}年{rng.randint(1,12)}月{rng.randint(1,28)}日",
    ])
    mynum = f"{rng.randint(1000,9999)} {rng.randint(1000,9999)} {rng.randint(1000,9999)}"
    sns = rng.choice([
        f"GitHub: {rng.choice(['tanaka-dev','suzuki-code','dev-taro'])}{rng.randint(1,9)}",
        f"Twitter: @{rng.choice(['user','dev','tech'])}_{rng.randint(100,999)}",
        f"LINE ID: {rng.choice(['taro','hana'])}_{rng.randint(100,999)}",
        f"Qiita: tech_writer{rng.randint(1,99)}",
    ])
    kind = rng.randrange(12 if variant_level >= 2 else 8)
    if kind == 8:  # fullwidth digits (normalization path; masking no-ops
        # on the raw text by reference semantics)
        fw = phone.translate(str.maketrans("0123456789", "０１２３４５６７８９"))
        return f"電話：{fw} まで。担当：{sn} {gn}"
    if kind == 9:  # bare postal + JA SNS labels
        return (f"郵便番号 {rng.randint(100,999)}-{rng.randint(1000,9999):04d} 宛て。"
                f"ツイッター：@{rng.choice(['dev','usr'])}_{rng.randint(10,99)} "
                f"ライン ID: u{rng.randint(100,999)}")
    if kind == 10:  # LABEL_ENDS boundary + era boundary date
        return (f"部長{sn}{gn}が承認しました。"
                f"生年月日：平成{rng.randint(15,20)}年{rng.randint(1,12)}月{rng.randint(1,28)}日")
    if kind == 11:  # address without building + U+3000-separated name
        return f"氏名：{sn}　{gn}\n住所：{addr.split(' ')[0]}"
    if kind == 0:
        return (f"応募者情報を登録しました。\n氏名：{sn}{sep}{gn}\nフリガナ：{kana}\n"
                f"生年月日：{birthday}\n住所：{postal} {addr}")
    if kind == 1:
        return f"担当：{sn}{sep}{gn} さんに引き継ぎます。連絡先は {email} です。"
    if kind == 2:
        return f"電話番号：{phone} までご連絡ください。担当は{sn}{gn}です。"
    if kind == 3:
        return f"上司：{sn} {gn}（開発部長）の承認が必要です。{sns}"
    if kind == 4:
        return f"配送先住所：{addr}\n電話：{phone}\nマイナンバー：{mynum}"
    if kind == 5:
        return (f"社員番号|氏名|フリガナ|生年月日|住所|電話\n"
                f"{rng.randint(1,999):03d}|{sn} {gn}|{kana}|{birthday}|{addr}|{phone}")
    if kind == 6:
        return (f"プロフィールを更新しました。メール：{email}\n"
                f"ポートフォリオ：https://{rng.choice(['tanaka','suzuki'])}-portfolio"
                f".example.app/works\n{sns}")
    return f"氏名：{sn} {gn}\nフリガナ：{kana}\n連絡先: {email} / {phone}"


def _tool_turn(rng: random.Random) -> str:
    kind = rng.randrange(3)
    if kind == 0:
        payload = {
            "status": 200,
            "results": [
                {"name": f"{rng.choice(_SURNAME_POOL)} {rng.choice(_GIVEN_POOL)}",
                 "email": f"user{rng.randint(1, 999)}@example.com",
                 "score": round(rng.random(), 3)}
                for _ in range(rng.randint(1, 3))
            ],
            "next_cursor": f"cur_{rng.randint(1000, 9999)}",
        }
        return json.dumps(payload, ensure_ascii=False)
    if kind == 1:
        return json.dumps({"rows_scanned": rng.randint(100, 100000),
                           "elapsed_ms": rng.randint(5, 500),
                           "cache_hit": rng.random() < 0.5})
    return ("path/to/report.txt の内容:\n集計対象: " + str(rng.randint(100, 9999))
            + " 件\n完了しました。")


def generate_transcripts(
    n_convs: int = 50,
    avg_turns: int = 20,
    seed: int = 42,
    hot_conv_every: int = 25,
    hot_factor: int = 12,
    variant_level: int = 1,
) -> pd.DataFrame:
    """Build the fixture table as pandas (write with to_parquet or Spark).

    Every ``hot_conv_every``-th conversation has ``hot_factor``x the average
    turn count, giving the skewed conv_id distribution the north rule's
    salted-repartitioning strategy is designed for.  ``variant_level=2``
    adds rarer PII shapes (fullwidth digits, bare postal, JA SNS labels,
    LABEL_ENDS boundaries) -- kept opt-in so bench fixtures stay comparable
    across rounds.
    """
    rng = random.Random(seed)
    base_ts = datetime(2025, 1, 1, 0, 0, 0)
    rows: list[tuple] = []
    for c in range(n_convs):
        conv_id = f"conv_{c:05d}"
        n_turns = avg_turns * (hot_factor if (c % hot_conv_every == hot_conv_every - 1)
                               else 1)
        n_turns = max(2, int(rng.gauss(n_turns, n_turns * 0.2)))
        ts = base_ts + timedelta(hours=c * 3)
        for t in range(n_turns):
            ts += timedelta(seconds=rng.randint(5, 300))
            role = rng.choices(["user", "assistant", "system", "tool"],
                               weights=[40, 40, 3, 17])[0]
            if role == "tool":
                text, tool = _tool_turn(rng), rng.choice(_TOOLS)
            else:
                tool = ""
                bucket = rng.random()
                if bucket < 0.35:
                    text = rng.choice(_CLEAN_JA)
                elif bucket < 0.55:
                    text = rng.choice(_CLEAN_EN)
                elif bucket < 0.75:
                    text = _pii_turn(rng, variant_level)
                elif bucket < 0.87:
                    text = rng.choice(_FP_TRAPS)
                else:
                    text = rng.choice(_DROP_TURNS)
            rows.append((conv_id, t, role, text, tool, ts))
    df = pd.DataFrame(rows, columns=SCHEMA_COLUMNS)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision end-to-end: Spark cannot scan TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def write_parquet(path: str, **kwargs) -> pd.DataFrame:
    df = generate_transcripts(**kwargs)
    # microsecond timestamps: Spark cannot scan parquet TIMESTAMP(NANOS)
    df.to_parquet(path, index=False, coerce_timestamps="us",
                  allow_truncated_timestamps=True)
    return df
