"""Language resources: stop words, noise corpus, stems.

The reference ships these in per-language resource packages loaded at
/root/reference/snips_nlu/resources.py:50-82. Those packages are not
available here, so this module defines the project's own small, fully
deterministic English resource set — it is the spec for BOTH the local
oracle and the Spark kernels, so fit/inference parity holds by
construction.
"""

from __future__ import annotations

# A compact English stop-word list (function words only; deliberately small
# so that slot values are never stop-word-only).
EN_STOP_WORDS = frozenset("""
a an the this that these those my your his her its our their
i you he she it we they me him us them
am is are was were be been being
do does did doing have has had having
and or but if then else so nor
to of in on at by for with from as into onto about
there here when where which who whom whose what why how
no not only own same than too very can will just should now
""".split())

# Noise vocabulary used to synthesize the None-intent class during
# classifier training (ref: log_reg_classifier_utils.py:63-90 samples from a
# language noise corpus). Deterministic list, cycled — never randomly drawn.
# Includes generic assistant/tool-chatter vocabulary so that transcript
# filler turns (the dominant None-class input in this pipeline) are learned
# as None by the classifier — the reference ships a large real-word noise
# corpus in its language-resource packages for the same purpose.
EN_NOISE = """
the be to of and a in that have i it for not on with he as you do at
this but his by from they we say her she or an will my one all would
there their what so up out if about who get which go me when can like
time no just him know take people into year your good some could them
see other than then now look only come its over think also back after
use two how our work first well way even new want because any these
give day most us is was are been has had were said did having may
alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima
mike november oscar papa quebec romeo sierra tango uniform victor whiskey
xray yankee zulu apple banana cherry date elderberry fig grape honeydew
kiwi lemon mango nectarine orange papaya quince raspberry strawberry
tangerine ugli vanilla walnut ximenia yam zucchini anchor bridge castle
dragon engine falcon garden harbor island jungle kettle ladder meadow
needle orchard pebble quarry river saddle temple umbrella valley window
sure working found logs processing request operation completed
successfully anything relevant checking system status done generated
querying backend service acknowledged standing unable reach device
retrying configuration saved report results pending update verified
received queue task finished running started stopped failed error
warning notice output input response data record entry field value
""".split()

# Minimal dictionary stems (en default featurizer has use_stemming=False,
# ref: default_configs/config_en.py:130 — kept for API completeness).
EN_STEMS: dict[str, str] = {
    "cups": "cup", "lights": "light", "flights": "flight",
    "makes": "make", "making": "make", "made": "make",
    "turns": "turn", "turning": "turn", "turned": "turn",
    "books": "book", "booking": "book", "booked": "book",
    "wants": "want", "wanted": "want", "prepares": "prepare",
    "prepared": "prepare", "preparing": "prepare",
}


# Common-words gazetteer backing the CRF ngram factories' rare_word
# substitution (ref: feature_factory.py:222-318 NgramFactory — ngrams whose
# words fall outside the gazetteer are replaced by the alias "rare_word").
# The reference ships ~10k-word per-language frequency lists in its
# resource packages; this compact committed stand-in covers the function
# words + the transcript/fixture domain vocabulary, which is what the
# substitution needs to separate common words from entity-value surface
# forms. Stored stemmed (the en config uses "top_10000_words_stemmed").
EN_COMMON_WORDS = frozenset(
    {EN_STEMS.get(w, w) for w in EN_NOISE}
    | set(EN_STOP_WORDS)
    | set("""
make brew prepare get give turn switch set put dim bright light
want need would like please thanks thank hello hi hey okay ok yes
check tell show find book weather forecast temperature rain snow sunny
today tomorrow tonight morning afternoon evening night week weekend
monday tuesday wednesday thursday friday saturday sunday
january february march april may june july august september october
november december
zero one two three four five six seven eight nine ten eleven twelve
thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty
thirty forty fifty sixty seventy eighty ninety hundred thousand million
first second third fourth fifth last next
cup glass bottle big small large little more less
room house home place city town country
coffee tea milk water juice chocolate hot cold warm
kitchen bedroom bathroom office garden
red green blue yellow white black
""".split()))

# Word-cluster map backing the word_cluster CRF factory (ref:
# feature_factory.py:335-376 WordClusterFactory; en default config uses
# cluster "brown_clusters", config_en.py:93-100). Real Brown clusters are a
# large corpus-derived artifact not shippable here; this committed map is a
# small genuine clustering of the transcript/fixture vocabulary into
# binary-path cluster ids with the same shape (word -> bit-string), so the
# factory's semantics (cluster-id feature value, None when absent) are
# exercised end-to-end.
_CLUSTER_GROUPS = {
    "000": "i you he she it we they me him her us them my your",
    "0010": "the a an this that these those",
    "0011": "is are was were be been am do does did have has had",
    "0100": "and or but if then so because",
    "0101": "to of in on at by for with from into onto about",
    "0110": "monday tuesday wednesday thursday friday saturday sunday",
    "01110": "january february march april may june july august september"
             " october november december",
    "01111": "today tomorrow tonight yesterday morning afternoon evening"
             " night noon midnight week weekend month year",
    "1000": "zero one two three four five six seven eight nine ten eleven"
            " twelve thirteen fourteen fifteen sixteen seventeen eighteen"
            " nineteen twenty thirty forty fifty sixty seventy eighty"
            " ninety hundred thousand million",
    "10010": "hot cold iced warm chilled steaming",
    "10011": "coffee tea espresso cappuccino latte mocha chocolate juice"
             " water milk soda lemonade cocoa",
    "10100": "kitchen bedroom bathroom garage hallway basement attic office"
             " lounge cellar",
    "10101": "red green blue yellow purple orange pink white black brown",
    "10110": "light lights lamp lamps bulb bulbs",
    "10111": "weather forecast temperature rain snow wind storm sunny"
             " cloudy humid",
    "11000": "make brew prepare fix pour serve",
    "11001": "turn switch set adjust dim brighten toggle",
    "11010": "book find search check show tell give get want need",
    "11011": "please thanks thank hello hi hey okay yes no sure",
    "11100": "cup cups glass glasses bottle bottles mug mugs shot shots",
    "11101": "big small large little tiny huge bright dark",
}
EN_BROWN_CLUSTERS: dict[str, str] = {
    word: path
    for path, words in _CLUSTER_GROUPS.items()
    for word in words.split()
}


# --- French resources -------------------------------------------------------
# Compact per-language set mirroring the reference's fr resource package
# (the reference ships stop words / noise / stems / a top-10k gazetteer per
# language; /root/reference/snips_nlu/default_configs/config_fr.py uses the
# same "top_10000_words_stemmed" gazetteer name). Number words (un/une…)
# are deliberately NOT stop words so number slots survive preprocessing.

FR_STOP_WORDS = frozenset("""
le la les l de du des au aux et ou mais donc or ni car que qui quoi dont
je tu il elle on nous vous ils elles me te se moi toi lui leur
ce cette ces cet mon ton son ma ta sa mes tes ses notre votre nos vos
est sont suis es sommes êtes était étais étaient être avoir ai as a avons
avez ont ne pas plus très bien tout tous toute toutes
dans sur sous avec sans pour par chez vers entre
y en si alors comme aussi encore déjà
""".split())

FR_NOISE = """
le la les de des et que pour dans avec sur est sont était je tu il nous
vous ils elle ont ete fait faire dit voir bien tout mais ou donc alors
temps jour monde vie homme femme enfant maison ville pays chose mot
merci bonjour bonsoir salut oui non peut faut va vient reste part
pomme banane cerise fraise orange citron raisin peche poire abricot
montagne riviere chateau jardin pont fenetre porte table chaise livre
recherche traitement demande operation terminee succes verification
systeme statut rapport genere service reconnu attente impossible
appareil nouvelle configuration enregistree resultats tache terminee
erreur avertissement sortie entree reponse donnees
""".split()

FR_STEMS: dict[str, str] = {
    "tasses": "tasse", "cafés": "café", "cafes": "café",
    "lumières": "lumière", "lumieres": "lumière",
    "chambres": "chambre", "vols": "vol", "billets": "billet",
    "prépares": "prépare", "préparés": "préparé",
    "allumes": "allume", "allumées": "allumée", "éteins": "éteins",
    "réserves": "réserve", "veux": "veut", "voudrais": "veut",
}

FR_COMMON_WORDS = frozenset(
    {FR_STEMS.get(w, w) for w in FR_NOISE}
    | set(FR_STOP_WORDS)
    | set("""
fais faire prépare faire donne mets met allume éteins règle réserve
veut veux voudrais cherche trouve montre dis
café thé lait eau jus chocolat tasse verre bouteille
chaud froid glacé grand petit
cuisine chambre salon bureau garage salle bain
rouge vert bleu jaune blanc noir violet rose
demain hier matin midi soir nuit semaine mois année
lundi mardi mercredi jeudi vendredi samedi dimanche
janvier février mars avril mai juin juillet août septembre octobre
novembre décembre
zéro un une deux trois quatre cinq six sept huit neuf dix onze douze
vingt trente quarante cinquante soixante cent mille
premier deuxième troisième dernier prochain
vol avion billet météo température pluie neige
""".split()))

# Value lists backing the gazetteer builtin entities (ref: the reference
# downloads per-language gazetteer resources via `snips-nlu download-entity
# snips/musicArtist en`, cli/download_entity.py, and builds a Rust
# gazetteer parser over them, entity_parser/builtin_entity_parser.py:
# 52-77 and :100-131). These compact committed lists play that role here;
# users extend them with
# ``entities.builtin.register_builtin_gazetteer_values``.
BUILTIN_GAZETTEER_VALUES: dict[tuple[str, str], tuple[str, ...]] = {
    ("en", "snips/musicArtist"): (
        "Daft Punk", "The Beatles", "Miles Davis", "Nina Simone",
        "David Bowie", "Radiohead", "Johnny Cash", "Aretha Franklin",
        "Bob Dylan", "Billie Holiday", "The Rolling Stones",
        "Stevie Wonder", "Joni Mitchell", "Leonard Cohen", "Kraftwerk",
        "John Coltrane", "Ella Fitzgerald", "Pink Floyd", "Queen",
        "Prince",
    ),
    ("fr", "snips/musicArtist"): (
        "Daft Punk", "Édith Piaf", "Serge Gainsbourg", "Jacques Brel",
        "Charles Aznavour", "Stromae", "Air", "Phoenix",
        "Françoise Hardy", "Georges Brassens", "MC Solaar", "Justice",
    ),
    ("en", "snips/city"): (
        "Paris", "London", "New York", "Tokyo", "Berlin", "Madrid",
        "Rome", "Oslo", "Sydney", "Toronto", "Chicago", "Seattle",
        "Amsterdam", "Lisbon", "Vienna", "Prague", "Dublin",
        "San Francisco", "Los Angeles", "Boston",
    ),
    ("fr", "snips/city"): (
        "Paris", "Lyon", "Marseille", "Toulouse", "Nice", "Nantes",
        "Strasbourg", "Montpellier", "Bordeaux", "Lille", "Rennes",
        "Grenoble",
    ),
}

# --- Spanish resources -------------------------------------------------------

ES_STOP_WORDS = frozenset("""
el la los las lo de del al a en con por para sin sobre entre hacia
y o pero si que como cuando donde quien cual
yo tú tu él ella nosotros vosotros ellos ellas me te se le les nos os
mi mis su sus nuestro nuestra este esta estos estas ese esa eso
es son soy eres somos sois era eran fue ser estar estoy está están
no sí ya muy más menos también todo todos toda todas
""".split())

ES_NOISE = """
el la de que y a en un ser se no haber por con su para como estar
tener le lo todo pero más hacer o poder decir este ir otro ese
tiempo dia mundo vida hombre mujer casa ciudad pais cosa palabra
gracias hola buenos dias buenas tardes noches si puede hay va viene
manzana platano cereza fresa naranja limon uva melocoton pera
montana rio castillo jardin puente ventana puerta mesa silla libro
busqueda tratamiento solicitud operacion terminada exito verificacion
sistema estado informe generado servicio reconocido espera imposible
aparato nueva configuracion guardada resultados tarea terminada
error advertencia salida entrada respuesta datos
""".split()

ES_STEMS: dict[str, str] = {
    "tazas": "taza", "cafés": "café", "cafes": "café",
    "luces": "luz", "habitaciones": "habitación", "vuelos": "vuelo",
    "billetes": "billete", "prepara": "preparar", "quiero": "querer",
    "enciende": "encender", "apaga": "apagar", "reserva": "reservar",
}

ES_COMMON_WORDS = frozenset(
    {ES_STEMS.get(w, w) for w in ES_NOISE}
    | set(ES_STOP_WORDS)
    | set("""
hazme haz prepara preparar pon poner dame dar enciende apaga ajusta
reserva reservar busca encuentra muestra dime
café té leche agua zumo jugo chocolate taza vaso botella
caliente frío helado grande pequeño
cocina dormitorio salón despacho garaje baño
rojo verde azul amarillo blanco negro morado rosa
mañana ayer hoy tarde noche semana mes año
lunes martes miércoles jueves viernes sábado domingo
enero febrero marzo abril mayo junio julio agosto septiembre octubre
noviembre diciembre
cero uno una dos tres cuatro cinco seis siete ocho nueve diez once
doce veinte treinta cuarenta cincuenta cien mil
primero segundo tercero último próximo
vuelo avión billete tiempo temperatura lluvia nieve
""".split()))

# --- German resources --------------------------------------------------------

DE_STOP_WORDS = frozenset("""
der die das den dem des ein eine einen einem einer eines
und oder aber wenn dann als wie dass ob weil denn
ich du er sie es wir ihr mich dich sich mir dir uns euch ihnen
mein meine dein deine sein seine ihr ihre unser unsere
ist sind bin bist war waren sein haben habe hat hatte hatten werden
wird nicht kein keine auch noch schon nur sehr mehr
zu von in an auf bei mit nach aus für über unter vor hinter zwischen
da dort hier wann wo wer was warum
""".split())

DE_NOISE = """
der die und in den von zu das mit sich des auf für ist im dem nicht
ein eine als auch es an werden aus er hat dass sie nach wird bei
einer um am sind noch wie einem über einen so zum war haben nur oder
aber vor zur bis mehr durch man sein wurde sei
zeit jahr tag welt leben mensch haus stadt land sache wort
danke hallo guten tag abend ja nein kann muss geht kommt bleibt
apfel banane kirsche erdbeere orange zitrone traube pfirsich birne
berg fluss schloss garten brücke fenster tür tisch stuhl buch
suche verarbeitung anfrage vorgang abgeschlossen erfolgreich
system status bericht erstellt dienst bestätigt warten unmöglich
gerät neue konfiguration gespeichert ergebnisse aufgabe beendet
fehler warnung ausgabe eingabe antwort daten
""".split()

DE_STEMS: dict[str, str] = {
    "tassen": "tasse", "lichter": "licht", "flüge": "flug",
    "zimmern": "zimmer", "tickets": "ticket",
    "möchte": "mögen", "will": "wollen", "mache": "machen",
    "machst": "machen", "koche": "kochen", "schalte": "schalten",
    "buche": "buchen",
}

DE_COMMON_WORDS = frozenset(
    {DE_STEMS.get(w, w) for w in DE_NOISE}
    | set(DE_STOP_WORDS)
    | set("""
mach mache machen koch koche kochen gib geben stell stellen schalte
schalten buche buchen suche suchen finde zeig zeigen sag sagen
bitte danke hallo ja nein
kaffee tee milch wasser saft schokolade tasse glas flasche
heiß kalt warm groß klein
küche schlafzimmer wohnzimmer büro garage bad
rot grün blau gelb weiß schwarz lila rosa
morgen gestern heute mittag abend nacht woche monat jahr
montag dienstag mittwoch donnerstag freitag samstag sonntag
januar februar märz april mai juni juli august september oktober
november dezember
null eins zwei drei vier fünf sechs sieben acht neun zehn elf zwölf
zwanzig dreißig vierzig fünfzig hundert tausend
erste zweite dritte letzte nächste
flug flugzeug ticket wetter temperatur regen schnee
""".split()))

# --- Italian resources --------------------------------------------------------

IT_STOP_WORDS = frozenset("""
il lo la i gli le un uno una di a da in con su per tra fra
e o ma se che come quando dove chi quale
io tu lui lei noi voi loro mi ti si ci vi me te
mio mia miei mie tuo tua suo sua nostro nostra vostro vostra
questo questa questi queste quello quella
è sono sei siamo siete era erano essere stare sto sta stanno
avere ho hai ha abbiamo avete hanno
non sì già molto più meno anche ancora tutto tutti tutta tutte
""".split())

IT_NOISE = """
il di che e la in a per è un sono le si con non una da su questo
come ma lo ha più o anche ci tutto della nel alla mi ai sua fatto
tempo anno giorno mondo vita uomo donna casa città paese cosa parola
grazie ciao buongiorno buonasera va bene posso deve viene resta parte
mela banana ciliegia fragola arancia limone uva pesca pera albicocca
montagna fiume castello giardino ponte finestra porta tavolo sedia libro
ricerca elaborazione richiesta operazione completata successo verifica
sistema stato rapporto generato servizio confermato attesa impossibile
dispositivo nuova configurazione salvata risultati attività terminata
errore avviso uscita ingresso risposta dati
""".split()

IT_STEMS: dict[str, str] = {
    "tazze": "tazza", "caffè": "caffè", "luci": "luce", "voli": "volo",
    "biglietti": "biglietto", "camere": "camera",
    "preparami": "preparare", "voglio": "volere", "accendi": "accendere",
    "spegni": "spegnere", "prenota": "prenotare", "fammi": "fare",
}

IT_COMMON_WORDS = frozenset(
    {IT_STEMS.get(w, w) for w in IT_NOISE}
    | set(IT_STOP_WORDS)
    | set("""
fammi fai fare prepara preparami metti dammi dare accendi spegni regola
prenota prenotare cerca trova mostra dimmi per favore grazie ciao
caffè tè latte acqua succo cioccolata tazza bicchiere bottiglia
caldo freddo ghiacciato grande piccolo
cucina camera soggiorno ufficio garage bagno
rosso verde blu giallo bianco nero viola rosa
domani ieri oggi mattina mezzogiorno sera notte settimana mese anno
lunedì martedì mercoledì giovedì venerdì sabato domenica
gennaio febbraio marzo aprile maggio giugno luglio agosto settembre
ottobre novembre dicembre
zero uno due tre quattro cinque sei sette otto nove dieci undici
dodici venti trenta quaranta cinquanta cento mille
primo secondo terzo ultimo prossimo
volo aereo biglietto tempo temperatura pioggia neve
""".split()))

# --- Portuguese resources ------------------------------------------------------

PT_STOP_WORDS = frozenset("""
o a os as um uns umas de do da dos das em no na nos nas por pelo pela
para com sem sobre entre até e ou mas se que como quando onde quem qual
eu tu ele ela nós vós eles elas me te se lhe lhes nos vos
meu minha meus minhas teu tua seu sua nosso nossa este esta esse essa
isto isso aquilo
é são sou és somos sois era eram foi ser estar estou está estão
ter tenho tens tem temos têm há
não sim já muito mais menos também todo todos toda todas
""".split())

PT_NOISE = """
o de a e que do da em um para é com não uma os no se na por mais as
dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos
já está eu também só pelo pela até isso ela entre era depois sem mesmo
tempo ano dia mundo vida homem mulher casa cidade país coisa palavra
obrigado olá bom dia boa tarde noite sim pode deve vai vem fica parte
maçã banana cereja morango laranja limão uva pêssego pera damasco
montanha rio castelo jardim ponte janela porta mesa cadeira livro
pesquisa processamento pedido operação concluída sucesso verificação
sistema estado relatório gerado serviço confirmado espera impossível
aparelho nova configuração guardada resultados tarefa terminada
erro aviso saída entrada resposta dados
""".split()

PT_STEMS: dict[str, str] = {
    "xícaras": "xícara", "chávenas": "chávena", "cafés": "café",
    "luzes": "luz", "voos": "voo", "bilhetes": "bilhete",
    "quartos": "quarto", "prepara": "preparar", "quero": "querer",
    "acende": "acender", "apaga": "apagar", "reserva": "reservar",
}

PT_COMMON_WORDS = frozenset(
    {PT_STEMS.get(w, w) for w in PT_NOISE}
    | set(PT_STOP_WORDS)
    | set("""
faz fazer prepara preparar põe dá dar acende apaga ajusta
reserva reservar procura encontra mostra diz por favor obrigado olá
café chá leite água sumo suco chocolate xícara chávena copo garrafa
quente frio gelado grande pequeno
cozinha quarto sala escritório garagem banheiro
vermelho verde azul amarelo branco preto roxo rosa
amanhã ontem hoje manhã tarde noite semana mês ano
segunda terça quarta quinta sexta sábado domingo
janeiro fevereiro março abril maio junho julho agosto setembro outubro
novembro dezembro
zero um uma dois duas três quatro cinco seis sete oito nove dez onze
doze vinte trinta quarenta cinquenta cem mil
primeiro segundo terceiro último próximo
voo avião bilhete tempo temperatura chuva neve
""".split()))

# ja: standalone-token particles only — the CJK script-run tokenizer
# merges adjacent hiragana, so particles fused to neighbouring hiragana
# words ("をください") won't match the list; the reference ja config
# sets ignore_stop_words=False for the same fragility reason. No
# stemming (no inflection dictionary shipped); the noise corpus is a
# small mixed-script word list for None-class augmentation.
JA_STOP_WORDS = frozenset(
    "の は を に が と で へ も や から まで です ます か".split())

JA_NOISE = """
天気 時間 今日 明日 音楽 電気 部屋 台所 寝室 窓 扉 机 椅子 本
りんご バナナ さくらんぼ いちご オレンジ レモン ぶどう もも なし
山 川 城 庭 橋 犬 猫 鳥 魚 花 木 空 海 雨 雪 風
検索 処理 要求 操作 完了 成功 確認 システム 状態 報告 生成
サービス 確定 待機 不可能 装置 新規 設定 保存 結果 作業 終了
エラー 警告 出力 入力 応答 データ
""".split()

JA_STEMS: dict[str, str] = {}

JA_COMMON_WORDS = frozenset(
    set(JA_NOISE) | set(JA_STOP_WORDS) | set("""
作って ください お願い こんにちは ありがとう
コーヒー 紅茶 お茶 牛乳 水 ジュース ココア カップ グラス
熱い 冷たい 大きい 小さい
居間 書斎 風呂 玄関 廊下
赤 青 緑 黄色 白 黒 紫 ピンク
月曜日 火曜日 水曜日 木曜日 金曜日 土曜日 日曜日
朝 昼 夕方 夜 今夜 来週 来月 来年
飛行機 切符 予約 気温 温度
""".split()))

# ko: particles are split off by the tokenizer
# (textcore._split_hangul_particle), so they work as standalone stop
# words; the reference ko config nevertheless sets
# ignore_stop_words=False, and this list stays minimal.
KO_STOP_WORDS = frozenset(
    "은 는 이 가 을 를 에 로 와 과 의 도 만 에서 부터 까지 으로".split())

KO_NOISE = """
날씨 시간 오늘 내일 음악 전기 방 부엌 침실 창문 문 책상 의자 책
사과 바나나 체리 딸기 오렌지 레몬 포도 복숭아 배
산 강 성 정원 다리 개 고양이 새 물고기 꽃 나무 하늘 바다 비 눈 바람
검색 처리 요청 작업 완료 성공 확인 시스템 상태 보고 생성
서비스 확정 대기 불가능 장치 신규 설정 저장 결과 종료
오류 경고 출력 입력 응답 데이터
""".split()

KO_STEMS: dict[str, str] = {}

KO_COMMON_WORDS = frozenset(
    set(KO_NOISE) | set(KO_STOP_WORDS) | set("""
만들어줘 주세요 부탁해 안녕하세요 감사합니다
커피 홍차 녹차 우유 물 주스 코코아 컵 잔
뜨거운 차가운 큰 작은
거실 서재 욕실 현관 복도
빨간 파란 초록 노란 하얀 검은 보라 분홍
월요일 화요일 수요일 목요일 금요일 토요일 일요일
아침 낮 저녁 밤 오늘밤 다음주
비행기 표 예약 기온 온도
""".split()))

_RESOURCE_TABLES = {
    "en": {
        "stop_words": EN_STOP_WORDS,
        "noise": EN_NOISE,
        "stems": EN_STEMS,
        "common_words": EN_COMMON_WORDS,
        "clusters": EN_BROWN_CLUSTERS,
    },
    "fr": {
        "stop_words": FR_STOP_WORDS,
        "noise": FR_NOISE,
        "stems": FR_STEMS,
        "common_words": FR_COMMON_WORDS,
        # no committed fr/es cluster maps (the en default config is the
        # only one that lists word_cluster; the factory degrades to
        # no-feature when the map is empty)
        "clusters": {},
    },
    "es": {
        "stop_words": ES_STOP_WORDS,
        "noise": ES_NOISE,
        "stems": ES_STEMS,
        "common_words": ES_COMMON_WORDS,
        "clusters": {},
    },
    "de": {
        "stop_words": DE_STOP_WORDS,
        "noise": DE_NOISE,
        "stems": DE_STEMS,
        "common_words": DE_COMMON_WORDS,
        "clusters": {},
    },
    "it": {
        "stop_words": IT_STOP_WORDS,
        "noise": IT_NOISE,
        "stems": IT_STEMS,
        "common_words": IT_COMMON_WORDS,
        "clusters": {},
    },
    "pt": {
        "stop_words": PT_STOP_WORDS,
        "noise": PT_NOISE,
        "stems": PT_STEMS,
        "common_words": PT_COMMON_WORDS,
        "clusters": {},
    },
    "ja": {
        "stop_words": JA_STOP_WORDS,
        "noise": JA_NOISE,
        "stems": JA_STEMS,
        "common_words": JA_COMMON_WORDS,
        "clusters": {},
    },
    "ko": {
        "stop_words": KO_STOP_WORDS,
        "noise": KO_NOISE,
        "stems": KO_STEMS,
        "common_words": KO_COMMON_WORDS,
        "clusters": {},
    },
}


def get_resources(language: str = "en") -> dict:
    """Resource bundle for a language (en, fr, es, de, it, pt, ja, ko)."""
    tables = _RESOURCE_TABLES.get(language)
    if tables is None:
        raise ValueError(
            f"unsupported language: {language!r} "
            f"(shipped: {sorted(_RESOURCE_TABLES)})")
    return {
        "language": language,
        "stop_words": set(tables["stop_words"]),
        "noise": list(tables["noise"]),
        "stems": dict(tables["stems"]),
        "gazetteers": {
            "top_10000_words_stemmed": set(tables["common_words"])},
        "word_clusters": {"brown_clusters": dict(tables["clusters"])},
    }
